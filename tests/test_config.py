"""Config system tests: strict keys, special parsing, list-DATASET."""

import pytest

from vlbert_tpu.utils.config import default_config, load_config, update_config


def test_default_trees_exist():
    for task in ("vcr", "vqa", "refcoco", "pretrain"):
        cfg = default_config(task)
        assert cfg.NETWORK.VLBERT.hidden_size == 512
        assert cfg.TRAIN.OPTIMIZER == "SGD"
    assert default_config("vcr").NETWORK.VLBERT.with_pooler is True
    assert default_config("vqa").NETWORK.VLBERT.with_pooler is False
    assert default_config("pretrain").NETWORK.VLBERT.visual_region_classes == 1601


def test_strict_key_check(tmp_path):
    f = tmp_path / "bad.yaml"
    f.write_text("NETWORK:\n  NOT_A_KEY: 1\n")
    with pytest.raises(ValueError, match="NOT_A_KEY"):
        update_config(default_config("vcr"), str(f))


def test_special_parsing(tmp_path):
    f = tmp_path / "exp.yaml"
    f.write_text(
        "SCALES:\n- 600\n- 1000\n"
        "TRAIN:\n  LR_STEP: '14,18'\n"
        "  LOSS_LOGGERS:\n  - 'ans_loss,AnsLoss'\n"
        "NETWORK:\n  VLBERT:\n    hidden_size: 768\n"
    )
    cfg = update_config(default_config("vcr"), str(f))
    assert cfg.SCALES == (600, 1000)
    assert cfg.TRAIN.LR_STEP == (14.0, 18.0)
    assert cfg.TRAIN.LOSS_LOGGERS == [("ans_loss", "AnsLoss")]
    assert cfg.NETWORK.VLBERT.hidden_size == 768


def test_vlbert_strict(tmp_path):
    f = tmp_path / "exp.yaml"
    f.write_text("NETWORK:\n  VLBERT:\n    bogus: 1\n")
    with pytest.raises(ValueError, match="bogus"):
        update_config(default_config("vcr"), str(f))


def test_list_dataset_pretrain(tmp_path):
    f = tmp_path / "exp.yaml"
    f.write_text(
        "DATASET:\n"
        "- DATASET: conceptual_captions\n"
        "  SEQ_LEN: 64\n"
        "- DATASET: general_corpus\n"
        "  SEQ_LEN: 64\n"
    )
    cfg = load_config("pretrain", str(f))
    assert isinstance(cfg.DATASET, list) and len(cfg.DATASET) == 2
    assert cfg.DATASET[0].DATASET == "conceptual_captions"
    # template fill: unspecified keys come from the DATASET defaults
    assert cfg.DATASET[1].ADD_IMAGE_AS_A_BOX is True


def test_list_dataset_rejected_for_finetune(tmp_path):
    f = tmp_path / "exp.yaml"
    f.write_text("DATASET:\n- DATASET: x\n")
    with pytest.raises(ValueError):
        update_config(default_config("vcr"), str(f))
