"""Config surface + JSON overlay semantics (reference config/parser.py:13-23)."""

import json

from tf_vqa_regat_tpu.config import Config, parse_with_config


def test_defaults_match_reference():
    cfg = parse_with_config([])
    # reference main.py:14-97 argparse defaults
    assert cfg.epochs == 20
    assert cfg.base_lr == 1e-3
    assert cfg.grad_clip == 0.25
    assert cfg.batch_size == 8
    assert cfg.seed == 42
    assert cfg.relation_type == "implicit"
    assert cfg.fusion == "mutan"
    assert cfg.num_hid == 1024
    assert cfg.nongt_dim == 20
    assert cfg.num_heads == 16
    assert cfg.dropout == 0.2
    assert cfg.mode == "train"
    assert not cfg.adaptive
    assert not cfg.tfidf


def test_json_overlay_cli_wins(tmp_path):
    p = tmp_path / "c.json"
    p.write_text(json.dumps({"batch_size": 256, "num_hid": 768, "adaptive": True}))
    cfg = parse_with_config(["--config", str(p), "--batch_size", "32"])
    assert cfg.batch_size == 32  # explicit CLI flag wins
    assert cfg.num_hid == 768  # JSON overrides default
    assert cfg.adaptive is True


def test_shipped_butd_config():
    cfg = parse_with_config(["--config", "configs/butd_vqa.json"])
    assert cfg.base_lr == 0.0009
    assert cfg.batch_size == 256
    assert cfg.fusion == "butd"
    assert cfg.relation_type == "implicit"
    assert cfg.num_hid == 768
    assert cfg.relation_dim == 1024
    assert cfg.residual_connection is True
    assert cfg.label_bias is False
    assert cfg.tfidf is True
    assert cfg.lr_decay_rate == 0.75
    assert cfg.resolved_num_rois() == 100  # adaptive
    assert cfg.word_dim == 600  # op='c'


def test_unknown_json_key_rejected(tmp_path):
    p = tmp_path / "c.json"
    p.write_text(json.dumps({"nonexistent_key": 1}))
    try:
        parse_with_config(["--config", str(p)])
        raised = False
    except ValueError:
        raised = True
    assert raised


def test_resolved_eval_batch():
    from tf_vqa_regat_tpu.config import Config

    # default: reference batch//4 contract, rounded to a dp multiple
    assert Config(batch_size=256).resolved_eval_batch(1) == 64
    assert Config(batch_size=8).resolved_eval_batch(8) == 8  # 2 -> rounded up
    # explicit override wins and still rounds up
    assert Config(batch_size=256, eval_batch=256).resolved_eval_batch(8) == 256
    assert Config(batch_size=256, eval_batch=100).resolved_eval_batch(8) == 104


def test_enum_flags_validated_at_construction():
    """A typo'd --feature_dtype (or compute_dtype/data_mode/prng_impl) must
    raise at Config construction — every entrypoint funnels through it, so a
    silent f32 fallback (4x the intended int8 footprint) cannot happen."""
    import pytest

    from tf_vqa_regat_tpu.config import Config

    for field, bad in [
        ("feature_dtype", "int08"),
        ("compute_dtype", "bf16"),
        ("data_mode", "devise"),
        ("prng_impl", "philox"),
    ]:
        with pytest.raises(ValueError, match=field):
            Config(**{field: bad})
    # replace() re-validates
    with pytest.raises(ValueError, match="feature_dtype"):
        Config().replace(feature_dtype="fp32")


def test_print_freq_validated():
    """print_freq 0 silences step lines (valid); negatives are rejected at
    construction instead of producing a nonsense modulus mid-run."""
    import pytest

    from tf_vqa_regat_tpu.config import Config

    assert Config(print_freq=0).print_freq == 0
    with pytest.raises(ValueError, match="print_freq"):
        Config(print_freq=-5)


def test_serve_flags_validated():
    """Serve flags validate at Config construction, not at MicroBatcher
    construction: an empty --serve_batch_sizes otherwise surfaced as an
    opaque `max() arg is an empty sequence` AFTER the full feature-table
    upload (round-3 review finding)."""
    import pytest

    from tf_vqa_regat_tpu.config import Config

    assert Config(serve_batch_sizes="1,4").serve_batch_sizes == "1,4"
    for bad in ("", " , ", "0", "4,-2"):
        with pytest.raises(ValueError, match="serve_batch_sizes"):
            Config(serve_batch_sizes=bad)
    with pytest.raises(ValueError, match="serve_max_delay_ms"):
        Config(serve_max_delay_ms=-1.0)
