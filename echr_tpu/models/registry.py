"""Model construction registry (reference: models/__init__.py:6-29)."""
from __future__ import annotations

import jax

from echr_tpu.config import Config
from echr_tpu.models.decoder import CORE_REGISTRY, init_decoder
from echr_tpu.models.sst import init_sst
from echr_tpu.models.tsrm import init_tsrm

Array = jax.Array


def init_tap(rng: Array, cfg: Config):
    """reference: setup_tap — SST is the only shipped TAP model."""
    if cfg.tap.tap_model != "SST":
        raise ValueError(f"tap model not supported: {cfg.tap.tap_model}")
    return init_sst(rng, cfg)


def init_captioner(rng: Array, cfg: Config):
    """Fusion (TSRM) + decoder parameter tree
    (reference: CaptionGenerator.__init__ + setup_lm/setup_fusion)."""
    k_fusion, k_dec = jax.random.split(rng)
    params = {"decoder": init_decoder(k_dec, cfg)}
    if cfg.uses_tsrm:
        if cfg.fusion.fusion_model != "TSRM8":
            raise ValueError(f"fusion model not supported: {cfg.fusion.fusion_model}")
        params["fusion"] = init_tsrm(k_fusion, cfg)
    return params


def available_caption_models():
    return sorted(CORE_REGISTRY)
