"""Reference-style clean failures on bad CLI inputs (the reference prints
a message and sys.exit(1)s: main_image.py:358,536, main_both.py:342)."""

import pytest


def test_build_fusion_rejects_unknown_strategy_eagerly():
    from garbage_classification_rca_tpu.models.fusion import (
        FusionConfig, build_fusion)

    with pytest.raises(ValueError, match="unknown late-fusion strategy"):
        build_fusion(FusionConfig(strategy="bogus"))


def test_main_image_invalid_optimizer_exits(capsys):
    from garbage_classification_rca_tpu.cli import main_image

    with pytest.raises(SystemExit):
        main_image.main(["--image_model=shuffle_net", "--opt=bogus",
                         "--dataset_folder_name=/nonexistent"])
    assert "Invalid optimizer!" in capsys.readouterr().out


def test_main_both_wrong_fusion_exits(capsys):
    from garbage_classification_rca_tpu.cli import main_both

    with pytest.raises(SystemExit):
        main_both.main(["--late_fusion=bogus",
                        "--dataset_folder_name=/nonexistent"])
    assert "Wrong late fusion strategy" in capsys.readouterr().out


def test_resolve_model_unknown_name_exits(capsys):
    from garbage_classification_rca_tpu.cli import resolve_model
    from garbage_classification_rca_tpu.models import get_image_model

    with pytest.raises(SystemExit):
        resolve_model(get_image_model, "bogus")
    out = capsys.readouterr().out
    assert "Invalid Model: bogus" in out and "shuffle_net" in out
