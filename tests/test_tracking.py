"""Tracker factory: native TB backend + wandb contract (faked module)."""

import sys
import types

import numpy as np
import pytest

from diff_pruning_tpu.utils.tracking import make_tracker


def test_tensorboard_tracker(tmp_path):
    tr = make_tracker("tensorboard", str(tmp_path))
    tr.add_scalar("loss", 1.5, 1)
    tr.flush()
    tr.close()
    import os

    files = [f for f in os.listdir(tmp_path) if "tfevents" in f]
    assert files, "no event file written"


def test_unknown_logger(tmp_path):
    with pytest.raises(ValueError):
        make_tracker("mlflow", str(tmp_path))


def test_wandb_missing_message(tmp_path, monkeypatch):
    monkeypatch.setitem(sys.modules, "wandb", None)
    with pytest.raises(ImportError, match="tensorboard"):
        make_tracker("wandb", str(tmp_path))


def test_wandb_tracker_contract(tmp_path, monkeypatch):
    """With a wandb module present, init/log/finish are called with the
    reference's shapes (ddpm_train.py:519-530 logging contract)."""
    calls = {"log": [], "finish": 0}

    class Run:
        def log(self, d, step=None):
            calls["log"].append((d, step))

        def finish(self):
            calls["finish"] += 1

    fake = types.ModuleType("wandb")
    def init(**kw):
        calls["init"] = kw
        return Run()

    fake.init = init
    monkeypatch.setitem(sys.modules, "wandb", fake)

    tr = make_tracker("wandb", str(tmp_path), config={"lr": 2e-4})
    tr.add_scalar("train/loss", 0.25, 7)
    tr.close()
    assert calls["init"]["config"] == {"lr": 2e-4}
    assert calls["init"]["mode"] == "offline"  # zero-egress default
    assert calls["log"] == [({"train/loss": 0.25}, 7)]
    assert calls["finish"] == 1
