"""Fingerprint / metric-logger / misc utility tests."""

import json
import os

import pytest

from mimic_tpu.train.trainer import MetricLogger
from mimic_tpu.utils import Fingerprint, Hasher


class TestFingerprint:
    def test_hash_stability(self):
        assert Hasher.hash({"a": 1, "b": [1, 2]}) == Hasher.hash({"a": 1, "b": [1, 2]})
        assert Hasher.hash({"a": 1}) != Hasher.hash({"a": 2})

    def test_store_validate_roundtrip(self, tmp_path):
        path = str(tmp_path / "fp.json")
        fp = Fingerprint(path)
        fp.update("sample-0", {"ids": [1, 2, 3]})
        fp.save()
        fp2 = Fingerprint(path)
        assert "sample-0" in fp2
        assert fp2.validate("sample-0", {"ids": [1, 2, 3]})
        assert not fp2.validate("sample-0", {"ids": [1, 2, 4]})

    def test_missing_key_raises(self):
        with pytest.raises(KeyError):
            Fingerprint().validate("nope", 1)


class TestMetricLogger:
    def test_jsonl_sink(self, tmp_path):
        logger = MetricLogger(str(tmp_path))
        logger.log(1, {"loss": 1.5, "ce_loss": 0.5})
        logger.log(2, {"loss": 1.2})
        rows = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
        assert rows[0]["loss"] == 1.5 and rows[0]["step"] == 1
        assert rows[1]["step"] == 2
