"""Dataset reader tests against fixture files in the reference layouts."""

import json
import os

import numpy as np
import pytest

from mimic_tpu.data import prefetch
from mimic_tpu.data.sources import (
    load_coco_caption,
    load_flickr30k,
    load_hateful_memes,
    load_ocr_vqa,
    load_seed_bench,
    load_vqav2,
    most_common_from_dict,
    train_validation_from_test,
)


def write_json(path, data):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(data, f)


@pytest.fixture
def vqav2_dir(tmp_path):
    data = tmp_path / "vqav2"
    images = tmp_path / "coco"
    for split in ("train2014", "val2014"):
        questions = {
            "questions": [
                {"question_id": i, "question": f"q{i}?", "image_id": 100 + i}
                for i in range(3)
            ]
        }
        annotations = {
            "annotations": [
                {
                    "question_id": i,
                    "question_type": "what is",
                    "answer_type": "other",
                    "multiple_choice_answer": "cat",
                    "image_id": 100 + i,
                    "answers": [
                        {"answer": "cat", "answer_confidence": "yes", "answer_id": j}
                        for j in range(10)
                    ],
                }
                for i in range(3)
            ]
        }
        write_json(str(data / f"v2_OpenEnded_mscoco_{split}_questions.json"), questions)
        write_json(str(data / f"v2_mscoco_{split}_annotations.json"), annotations)
    return str(data), str(images)


class TestVQAv2:
    def test_layout_and_fields(self, vqav2_dir):
        data, images = vqav2_dir
        splits = load_vqav2(data, images)
        assert len(splits["train"]) == 3 and len(splits["validation"]) == 3
        item = splits["train"][0]
        assert item["question"] == "q0?"
        assert item["answer"] == "cat"
        assert item["image"].endswith("COCO_train2014_000000000100.jpg")
        assert len(item["answers"]) == 10

    def test_most_common(self):
        answers = [{"answer": "a"}, {"answer": "b"}, {"answer": "b"}]
        assert most_common_from_dict(answers) == "b"


class TestKarpathy:
    def _write(self, path, name, n=4):
        images = []
        for i in range(n):
            split = ["train", "val", "test"][i % 3]
            images.append(
                {
                    "filename": f"img{i}.jpg",
                    "imgid": i,
                    "cocoid": 1000 + i,
                    "split": split,
                    "sentids": [i],
                    "sentences": [
                        {"raw": f"caption {i} first", "tokens": ["caption"], "sentid": i},
                        {"raw": f"caption {i} second", "tokens": ["caption"], "sentid": i + 100},
                    ],
                }
            )
        write_json(path + f"/{name}", {"images": images})

    def test_coco(self, tmp_path):
        self._write(str(tmp_path), "dataset_coco.json", n=6)
        splits = load_coco_caption(str(tmp_path), str(tmp_path / "images"))
        assert len(splits["train"]) == 2
        item = splits["train"][0]
        assert item["caption"].endswith("first")
        assert len(item["sentences_raw"]) == 2
        assert "train2014" in item["image"]

    def test_flickr(self, tmp_path):
        self._write(str(tmp_path), "dataset_flickr30k.json", n=3)
        splits = load_flickr30k(str(tmp_path), str(tmp_path / "flickr30k-images"))
        assert len(splits["validation"]) == 1


class TestOCRVQA:
    def test_layout(self, tmp_path):
        write_json(
            str(tmp_path / "dataset.json"),
            {
                "id1": {
                    "split": 1,
                    "imageURL": "http://x/im.jpg",
                    "questions": ["what book?"],
                    "answers": ["a novel"],
                    "genre": "fiction",
                },
                "id2": {
                    "split": 2,
                    "imageURL": "http://x/im2.png",
                    "questions": ["author?", "year?"],
                    "answers": ["someone", "1999"],
                },
            },
        )
        splits = load_ocr_vqa(str(tmp_path), None)
        assert len(splits["train"]) == 1
        assert len(splits["validation"]) == 2
        assert splits["validation"][0]["question_id"] == "id2-0"


class TestSeedBench:
    def test_skips_missing_images(self, tmp_path):
        img_dir = tmp_path / "SEED-Bench-image"
        img_dir.mkdir()
        (img_dir / "present.png").write_bytes(b"x")
        write_json(
            str(tmp_path / "SEED-Bench.json"),
            {
                "questions": [
                    {
                        "answer": "A", "choice_a": "1", "choice_b": "2",
                        "choice_c": "3", "choice_d": "4", "data_id": "present.png",
                        "data_type": "image", "question": "q?", "question_id": "s1",
                        "question_type_id": 1,
                    },
                    {
                        "answer": "B", "choice_a": "1", "choice_b": "2",
                        "choice_c": "3", "choice_d": "4", "data_id": "missing.png",
                        "data_type": "image", "question": "q?", "question_id": "s2",
                        "question_type_id": 1,
                    },
                ]
            },
        )
        splits = load_seed_bench(str(tmp_path))
        assert len(splits["test"]) == 1
        assert splits["test"][0]["question_id"] == "s1"

    def test_train_test_split_semantics(self):
        items = list(range(10))
        out = train_validation_from_test(items, 3)
        assert out["train"] == [0, 1, 2]
        assert out["validation"] == list(range(3, 10))


class TestHatefulMemes:
    def test_jsonl(self, tmp_path):
        with open(tmp_path / "train.jsonl", "w") as f:
            f.write(json.dumps({"id": 1, "img": "img/a.png", "text": "x", "label": 1}) + "\n")
        with open(tmp_path / "dev.jsonl", "w") as f:
            f.write(json.dumps({"id": 2, "img": "img/b.png", "text": "y", "label": 0}) + "\n")
        splits = load_hateful_memes(str(tmp_path))
        assert splits["train"][0]["img"].endswith("img/a.png")
        assert splits["validation"][0]["label"] == 0


class TestPrefetch:
    def test_order_preserved(self):
        out = list(prefetch(range(100), depth=4))
        assert out == list(range(100))

    def test_transform(self):
        out = list(prefetch(range(5), transform=lambda x: x * 2))
        assert out == [0, 2, 4, 6, 8]

    def test_error_propagates(self):
        def gen():
            yield 1
            raise RuntimeError("boom")

        with pytest.raises(RuntimeError, match="boom"):
            list(prefetch(gen()))
