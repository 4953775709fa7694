import pytest

from mimic_tpu.config import (
    EvalConfig,
    ShiftStrategy,
    Strategy,
    TrainConfig,
    apply_overrides,
    config_from_dict,
    get_preset,
    parse_shift_strategy,
    parse_strategy,
    preset_names,
)
from mimic_tpu.utils import get_expand_runname


class TestFlags:
    def test_parse_simple(self):
        assert parse_strategy("Strategy.LM_LOSS") == Strategy.LM_LOSS

    def test_parse_combined(self):
        s = parse_strategy("Strategy.LM_LOSS | Strategy.LAYER_WISE_MSE")
        assert Strategy.LM_LOSS in s and Strategy.LAYER_WISE_MSE in s

    def test_parse_without_prefix(self):
        assert parse_strategy("LM_LOSS|LOGITS_KL_DIV") == Strategy.LM_LOSS | Strategy.LOGITS_KL_DIV

    def test_parse_none(self):
        assert parse_strategy(None) == Strategy.NONE
        assert parse_shift_strategy("") == ShiftStrategy.NONE
        assert parse_shift_strategy("null") == ShiftStrategy.NONE

    def test_unknown_flag_raises(self):
        # the reference's attn_shift_ffn_mse.yaml names this nonexistent member and
        # would crash inside eval(); we fail fast with a clear error
        with pytest.raises(ValueError, match="LEARNABLE_SCALE"):
            parse_shift_strategy("ShiftStrategy.VECTOR_SHIFT | ShiftStrategy.LEARNABLE_SCALE")

    def test_no_code_execution(self):
        with pytest.raises(ValueError):
            parse_strategy("__import__('os').system('true')")

    def test_mutual_exclusion(self):
        # reference src/shift_model.py:34-43
        with pytest.raises(ValueError):
            parse_strategy("LAYER_WISE_MSE | LAYER_WISE_COS_SIM")

    def test_scale_requires_vector(self):
        # reference src/shift_encoder.py:73-78
        with pytest.raises(ValueError):
            parse_shift_strategy("LEARNABLE_SHIFT_SCALE")

    def test_layer_wise_name(self):
        assert parse_strategy("LAYER_WISE_MSE|LM_LOSS").layer_wise_name() == "mse_loss"
        assert parse_strategy("LAYER_WISE_COS_SIM").layer_wise_name() == "cos_sim"
        assert not parse_strategy("LM_LOSS").has_layer_wise()


class TestPresets:
    def test_all_presets_parse(self):
        for name in preset_names():
            enc, peft = get_preset(name)
            enc.strategy()
            enc.attn()
            enc.ffn()

    def test_mimic_preset(self):
        enc, peft = get_preset("mimic")
        assert enc.kind == "attn_approximator"
        assert ShiftStrategy.MULTI_HEAD in enc.attn()
        assert ShiftStrategy.RECORD_HIDDEN_STATES in enc.ffn()
        assert peft.lr == 5e-3 and peft.ce_loss_weight == 0.5

    def test_lora_preset(self):
        enc, peft = get_preset("lora")
        assert enc.strategy() == Strategy.LM_LOSS
        assert peft.lora is not None
        assert peft.lora.scaling() == 2.0

    def test_licv_preset(self):
        enc, peft = get_preset("licv")
        assert enc.shift_scale_init_value == 0.1
        assert peft.scale_lr == 1e-2


class TestRunNaming:
    def test_train_runname_with_shots(self):
        # reference src/utils.py:129
        cfg = TrainConfig(runname="default", model_name="idefics2-8b-base")
        cfg.data.name = "vqav2"
        cfg.data.num_query_samples = 500
        cfg.data.num_shot = 32
        assert get_expand_runname(cfg) == "default-idefics2-8b-base-vqav2-500-32shot"

    def test_train_runname_peft(self):
        # reference src/utils.py:125-127 — num_shot==0 drops the suffix
        cfg = TrainConfig(runname="lora", model_name="idefics-9b")
        cfg.data.name = "ok_vqa"
        cfg.data.num_query_samples = 100
        cfg.data.num_shot = 0
        assert get_expand_runname(cfg) == "lora-idefics-9b-ok_vqa-100"

    def test_eval_icl_runname(self):
        cfg = EvalConfig(model_name="idefics-9b")
        cfg.data.name = "vqav2"
        assert get_expand_runname(cfg) == "icl-idefics-9b-vqav2"

    def test_eval_ckpt_runname(self):
        cfg = EvalConfig(ckpt_path="results/ckpt/default-idefics2-8b-base-vqav2-500-32shot/epoch-9")
        assert get_expand_runname(cfg) == "default-idefics2-8b-base-vqav2-500-32shot"


class TestOverrides:
    def test_dotted_override(self):
        cfg = TrainConfig()
        apply_overrides(cfg, ["data.num_shot=16", "lr=0.001", "runname=exp1"])
        assert cfg.data.num_shot == 16
        assert cfg.lr == 0.001
        assert cfg.runname == "exp1"

    def test_unknown_field_raises(self):
        with pytest.raises(AttributeError):
            apply_overrides(TrainConfig(), ["nonexistent=1"])

    def test_from_dict_nested(self):
        cfg = config_from_dict(
            TrainConfig, {"lr": 0.01, "data": {"name": "coco", "num_shot": 8}}
        )
        assert cfg.lr == 0.01 and cfg.data.name == "coco" and cfg.data.num_shot == 8
