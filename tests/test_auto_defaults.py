"""Platform-aware 'auto' defaults: the measured-best training configuration
(fused Pallas train attention + packed passages, 104.2 ex/s — bench_train.py)
is the NO-FLAGS default on TPU, while CPU (the hermetic test platform) keeps
the XLA path and the flat reference layout. Explicit flags always win.

Covers ``models.resolve_attention_impl`` / ``train.resolve_pack_passages``
and the Trainer's config resolution (config.yaml records what actually ran).
"""
import jax
import jax.numpy as jnp

from cldrd_tpu.models import (DistilBertConfig, DistilBertEncoder,
                              resolve_attention_impl)
from cldrd_tpu.train import TrainConfig, Trainer, resolve_pack_passages


def test_defaults_are_auto():
    assert DistilBertConfig().attention_impl == "auto"
    assert DistilBertConfig.tiny().attention_impl == "auto"
    assert TrainConfig().pack_passages is None


def test_resolve_on_cpu():
    # the suite forces the cpu backend (conftest): auto -> xla + flat
    assert resolve_attention_impl("auto", True) == "xla"
    assert resolve_attention_impl("auto", False) == "xla"
    assert resolve_pack_passages(None) is False


def test_resolve_on_tpu(monkeypatch):
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    # training (dropout active) -> the fused Pallas train kernels
    assert resolve_attention_impl("auto", True) == "pallas"
    # inference/encode stays XLA even on TPU (the 0.98x finding, docs/perf.md)
    assert resolve_attention_impl("auto", False) == "xla"
    assert resolve_pack_passages(None) is True


def test_explicit_flags_override(monkeypatch):
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert resolve_attention_impl("xla", True) == "xla"
    assert resolve_attention_impl("pallas", False) == "pallas"
    assert resolve_pack_passages(False) is False
    assert resolve_pack_passages(True) is True


def test_trainer_records_resolved_config(tmp_path):
    """Trainer resolves 'auto' at construction so the saved config.yaml
    records the concrete value that actually ran (False on this cpu
    backend), and make_train_step sees a bool, never None."""
    cfg = TrainConfig(run_folder=str(tmp_path), experiment_name="auto")
    trainer = Trainer(cfg, DistilBertConfig.tiny())
    assert trainer.cfg.pack_passages is False
    text = open(tmp_path / "auto" / "config.yaml").read()
    assert "pack_passages: false" in text


def test_auto_encoder_matches_explicit_xla_on_cpu():
    """On the cpu backend the default ('auto') encoder is bit-identical to
    an explicit attention_impl='xla' encoder — both deterministic and with
    dropout off (auto resolves to xla either way here)."""
    cfg_auto = DistilBertConfig.tiny()
    cfg_xla = DistilBertConfig.tiny(attention_impl="xla")
    enc_auto, enc_xla = DistilBertEncoder(cfg_auto), DistilBertEncoder(cfg_xla)
    ids = (jnp.arange(2 * 16, dtype=jnp.int32).reshape(2, 16)
           % cfg_auto.vocab_size)
    mask = jnp.ones((2, 16), jnp.int32)
    params = enc_xla.init(jax.random.PRNGKey(0), ids, mask)["params"]
    out_auto = enc_auto.apply({"params": params}, ids, mask)
    out_xla = enc_xla.apply({"params": params}, ids, mask)
    assert (out_auto == out_xla).all()
