"""Config system tests: YAML _BASE_ inheritance, literal decoding of the
reference's tuple-typed keys, CLI overrides, freeze semantics."""

import os

import pytest

from lvt_tpu.config import get_cfg

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")


def test_defaults_tree_has_reference_keys():
    cfg = get_cfg()
    # spot-check each major subtree against reference defaults.py:1-171
    assert cfg.MODEL.META_ARCHITECTURE == "ACAIModel"
    assert cfg.MODEL.IGNORE_INDEX == -100
    assert cfg.MODEL.AUTOREGRESSIVE.VT.PAD_VALUE == -1
    assert cfg.MODEL.CODEBOOK.SIZE == 512
    assert cfg.SOLVER.RMSPROP.ALPHA_G == 0.99
    assert cfg.TEST.VT_SAMPLER.N_PRIME == 5
    assert cfg.VERSION == 1


def test_load_dsfvt_yaml():
    cfg = get_cfg()
    cfg.merge_from_file(os.path.join(CONFIG_DIR, "vt", "DSFVT.yaml"))
    vt = cfg.MODEL.AUTOREGRESSIVE.VT
    assert vt.STRIDE == (16, 1, 1)
    assert vt.KERNEL == (7, 1, 1)
    assert vt.BLOCKS_E == tuple([(1, 16, 16)] * 8)
    assert vt.N_HEAD_D == (8,) * 8
    assert cfg.DATASETS.TRAIN == ("prdvqvae_train",)
    assert cfg.SOLVER.OPTIMIZER_NAME == "rmsprop"
    assert cfg.SOLVER.LR_G == 2e-5
    assert cfg.INPUT.SCALE_TO_ZEROONE is False


def test_load_vqvae_yaml_with_base_inheritance():
    cfg = get_cfg()
    cfg.merge_from_file(os.path.join(CONFIG_DIR, "vqvae", "PR-DVQVAE2.yaml"))
    # from _BASE_ (Base-VQVAE.yaml)
    assert cfg.MODEL.META_ARCHITECTURE == "VQVAEModel"
    assert cfg.MODEL.ENCODER.NF == 256
    assert cfg.SOLVER.MAX_ITER == 500000
    # overridden by child
    assert cfg.MODEL.CODEBOOK.NUM == 4
    assert cfg.MODEL.PIXEL_MEAN == [0.5, 0.5, 0.5]
    assert cfg.DATASETS.TEST == ("bair_test_seq",)


def test_merge_from_list():
    cfg = get_cfg()
    cfg.merge_from_list(["SOLVER.LR_G", "0.01", "MODEL.CODEBOOK.NUM", "2",
                         "DATASETS.TRAIN", "('x',)", "INPUT.SCALE_TO_ZEROONE", "False"])
    assert cfg.SOLVER.LR_G == 0.01
    assert cfg.MODEL.CODEBOOK.NUM == 2
    assert cfg.DATASETS.TRAIN == ("x",)
    assert cfg.INPUT.SCALE_TO_ZEROONE is False


def test_merge_from_list_rejects_unknown_key():
    cfg = get_cfg()
    with pytest.raises(KeyError):
        cfg.merge_from_list(["MODEL.NO_SUCH_KEY", "1"])


def test_freeze_blocks_writes():
    cfg = get_cfg()
    cfg.freeze()
    with pytest.raises(AttributeError):
        cfg.SOLVER.LR_G = 0.5
    cfg.defrost()
    cfg.SOLVER.LR_G = 0.5
    assert cfg.SOLVER.LR_G == 0.5


def test_clone_is_independent():
    cfg = get_cfg()
    c2 = cfg.clone()
    c2.SOLVER.LR_G = 123.0
    assert cfg.SOLVER.LR_G != 123.0
