import pytest

from mimic_tpu.data import (
    BatchSampler,
    ConcatSampler,
    DistributedSampler,
    MultiBatchSampler,
    RandomSampler,
    SequentialSampler,
    apply_prompt_template,
    postprocess_generation,
    prepare_dataloader,
    prepare_input,
)


def vqa_item(i, with_answer=True):
    item = {"question": f"what is {i}?", "image": f"img{i}"}
    if with_answer:
        item["answer"] = f"thing {i}"
    return item


class TestSamplers:
    def test_concat_sampler_offsets(self):
        # reference docstring example (testbed/data/sampler/__init__.py:20-29)
        s1 = SequentialSampler(3)
        s2 = SequentialSampler(5)
        concat = ConcatSampler([BatchSampler(s1, 1), BatchSampler(s2, 1)], [3, 8])
        assert list(concat)[:3] == [[0, 3], [1, 4], [2, 5]]

    def test_prepare_dataloader_example(self):
        # reference docstring example (testbed/data/__init__.py:218-229)
        d1, d2 = list(range(5)), list(range(5, 10))
        dl = prepare_dataloader(
            [d1, d2], batch_size=2, num_shots=2, num_per_dataset=[1, 2]
        )
        batches = list(dl)
        assert batches[0] == [[0, 5, 6], [1, 7, 8]]

    def test_random_sampler_deterministic(self):
        a = list(RandomSampler(10, seed=7))
        b = list(RandomSampler(10, seed=7))
        assert a == b
        assert sorted(a) == list(range(10))

    def test_random_with_replacement(self):
        s = RandomSampler(5, replacement=True, num_samples=20, seed=1)
        idxs = list(s)
        assert len(idxs) == 20 and all(0 <= i < 5 for i in idxs)

    def test_distributed_sampler_partition(self):
        parts = [list(DistributedSampler(10, num_replicas=4, rank=r)) for r in range(4)]
        # padded to 12 and interleaved round-robin
        assert all(len(p) == 3 for p in parts)
        flat = sorted(i for p in parts for i in p)
        assert set(flat) >= set(range(10))

    def test_multibatch_merge(self):
        concat = ConcatSampler([BatchSampler(SequentialSampler(8), 2)])
        multi = MultiBatchSampler(concat, 2, drop_last=True)
        assert list(multi) == [[0, 1, 2, 3], [4, 5, 6, 7]]

    def test_multibatch_rejects_bad_size(self):
        with pytest.raises(ValueError):
            MultiBatchSampler(None, 0, False)


class TestPrepareInput:
    def test_vqa_context(self):
        batch = [[vqa_item(0), vqa_item(1), vqa_item(2, with_answer=False)]]
        messages, images = prepare_input("vqav2", batch, instruction="Answer it.")
        msgs = messages[0]
        assert msgs[0] == {"role": "instruction", "content": "Answer it."}
        assert msgs[1]["role"] == "image"
        # final answer message is content-less (generation prompt)
        assert msgs[-1] == {"role": "answer"}
        assert images[0] == ["img0", "img1", "img2"]

    def test_caption_context(self):
        batch = [[{"caption": "a dog", "image": "i0"}, {"caption": "x", "image": "i1"}]]
        messages, images = prepare_input("coco", batch)
        assert messages[0][-1] == {"role": "caption"}
        assert len(messages[0]) == 4

    def test_unregistered_raises(self):
        with pytest.raises(KeyError):
            prepare_input("nope", [[{}]])


class TestPostprocess:
    def test_stop_word_truncation(self):
        out = postprocess_generation("vqav2", "two dogs\nQuestion: what", ["\n", "Question"])
        assert out == "two dogs"

    def test_batched(self):
        out = postprocess_generation("vqav2", ["a\nb", "c Question x"], ["\n", "Question"])
        assert out == ["a", "c"]

    def test_mme_yes_no(self):
        assert postprocess_generation("mme", "Yes", ["\n"]) == 1
        assert postprocess_generation("mme", "no", ["\n"]) == 0
        assert postprocess_generation("mme", "maybe", ["\n"]) == -1

    def test_okvqa_stemming(self):
        assert postprocess_generation("ok_vqa", "riding horses\nnext", ["\n"]) == "ride horse"

    def test_hateful_memes(self):
        assert postprocess_generation("hateful_memes", "Yes it is", None) == 1
        assert postprocess_generation("hateful_memes", "it is benign", None) == 0
        assert postprocess_generation("hateful_memes", "unclear", None) == 0


class TestTemplates:
    """Golden outputs verified against the reference Jinja templates rendered with
    an HF-style jinja2 environment (see testbed/models/*.py default_prompt_template)."""

    def _ctx(self):
        return [
            {"role": "instruction", "content": "Use the image."},
            {"role": "image", "content": [{"type": "image"}]},
            {"role": "question", "content": [{"type": "text", "text": "what?"}]},
            {"role": "answer", "content": [{"type": "text", "text": "cat"}]},
            {"role": "image", "content": [{"type": "image"}]},
            {"role": "question", "content": [{"type": "text", "text": "who?"}]},
            {"role": "answer"},
        ]

    def test_idefics1(self):
        out = apply_prompt_template(self._ctx(), "idefics1")
        assert out == (
            "Instruction: Use the image.\n"
            "Image:<image> Question: what? Answer: cat\n"
            "Image:<image> Question: who? Answer:"
        )

    def test_idefics2(self):
        out = apply_prompt_template(self._ctx(), "idefics2")
        # the reference template emits the literally misspelled token (see
        # testbed/models/idefics2.py:42,68 — its cleanup replace never matches)
        assert out == (
            "Instruction: Use the image.<end_of_outterance>\n"
            "Image:<image><end_of_outterance>\n"
            "Question: what?<end_of_outterance>\n"
            "Answer: cat<end_of_outterance>\n"
            "Image:<image><end_of_outterance>\n"
            "Question: who?<end_of_outterance>\n"
            "Answer:"
        )

    def test_llava_interleave(self):
        out = apply_prompt_template(self._ctx(), "llava-interleave")
        assert out == (
            "<|im_start|>instruction\nUse the image.<|im_end|>\n"
            "<|im_start|>image\n<image><|im_end|>\n"
            "<|im_start|>question\n\nwhat?<|im_end|>\n"
            "<|im_start|>answer\n\ncat<|im_end|>\n"
            "<|im_start|>image\n<image><|im_end|>\n"
            "<|im_start|>question\n\nwho?<|im_end|>\n"
            "<|im_start|>answer\n"
        )

    def test_llava_15(self):
        out = apply_prompt_template(self._ctx(), "llava-1.5")
        assert out == (
            "Use the image.\n"
            "IMAGE: <image>\nQUESTION: what? ANSWER: cat "
            "IMAGE: <image>\nQUESTION: who? ANSWER:"
        )

    def test_generation_prompt(self):
        ctx = self._ctx()[:-1] + [
            {"role": "answer", "content": [{"type": "text", "text": "dog"}]}
        ]
        out = apply_prompt_template(ctx, "idefics1", add_generation_prompt=True)
        assert out.endswith("Answer: dog\nAnswer:")

    def test_batched(self):
        outs = apply_prompt_template([self._ctx(), self._ctx()], "idefics1")
        assert len(outs) == 2 and outs[0] == outs[1]


class TestTrainContextSplit:
    """Mirror of DatasetBase.train_dataloader's collate: contexts are split into
    prefix (demos) and query (last round) via message-list slicing
    (reference src/dataset_utils/interface.py:199-233)."""

    def test_split_roles(self):
        batch = [[vqa_item(0), vqa_item(1), vqa_item(2, with_answer=False)]]
        messages, _ = prepare_input("vqav2", batch, instruction="Do it.")
        num_role = 3
        ctx = messages[0]
        prefix = apply_prompt_template(ctx[:-num_role], "idefics1")
        query = apply_prompt_template(ctx[-num_role:], "idefics1")
        assert prefix.startswith("Instruction: Do it.\n")
        assert "what is 0?" in prefix and "what is 2?" not in prefix
        assert query == "Image:<image> Question: what is 2? Answer:"


class TestPrefetchWorkers:
    def test_pooled_transform_preserves_order(self):
        import time as _time

        from mimic_tpu.data.prefetch import prefetch

        def slow_sq(x):
            _time.sleep(0.01 * ((x * 7) % 3))  # uneven latency → reorder hazard
            return x * x

        out = list(prefetch(range(20), depth=2, transform=slow_sq, workers=4))
        assert out == [x * x for x in range(20)]

    def test_pooled_transform_propagates_errors(self):
        import pytest

        from mimic_tpu.data.prefetch import prefetch

        def boom(x):
            if x == 3:
                raise ValueError("bad item")
            return x

        it = prefetch(range(6), transform=boom, workers=3)
        with pytest.raises(ValueError, match="bad item"):
            list(it)
