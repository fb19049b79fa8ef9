"""Checkpoint export: flax variables -> reference torch state_dicts.

The inverse of eval/convert.py — makes checkpoint interop bidirectional: a
model trained in this framework exports to the reference's on-disk format
(`models/checkpoint.pt` with the keys reference trainer.py:153-163 writes,
plus `params.pkl`), so reference tooling (its eval.py / tournament.py, or
any torch code built around those state_dicts) can load it directly.

Layout mappings are the exact inverses documented in eval/convert.py:
- kernel [kd, kh, kw, I, O] -> Conv3d weight [O, I, kd, kh, kw]
- kernel [kd, kh, kw, I, O] -> ConvTranspose3d weight [I, O, kd, kh, kw]
- kernel [I, O]             -> Linear weight [O, I]
- scale/bias + batch_stats  -> BN weight/bias/running_* (+ a zero
  num_batches_tracked so torch strict loading passes)
- [D, H, W, C] LayerNorm    -> [C, D, H, W]
- `spectral` {u, v} + kernel -> torch parametrize keys
  (`<mod>.parametrizations.weight.original` / `.0._u` / `.0._v`)

Families: DCGAN (all four D variants) and the BigGAN/SNGAN/SAGAN deep
family — the ones the reference's own eval/tournament load (its eval.py:
15-29 handles exactly dcgan-vs-biggan). StyleGAN export is not implemented
(the reference's stylegan paths crash as shipped; converted checkpoints
would have nothing upstream to load them).

Optimizer states export as EMPTY torch-Adam state dicts with correct
param_groups (torch fills moments lazily on the first step); a torch-side
resume therefore restarts Adam moments — documented deviation, since optax
and torch Adam states are not bit-compatible.

Round-trip tested (export -> eval.convert importers -> tree equality) for
every supported family, and torch-oracle tested (strict load_state_dict
into reference-layout torch modules + forward parity) in
tests/test_export.py.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from gan3d_tpu.config import Config

Tree = Dict[str, Any]
SD = Dict[str, np.ndarray]


def _np32(x) -> np.ndarray:
    return np.asarray(x, np.float32)


# ---------------------------------------------------------------------------
# per-module inverses (of eval/convert.py's _conv/_linear/_bn/_layernorm)
# ---------------------------------------------------------------------------
def _conv_out(sd: SD, prefix: str, params: Tree, spectral: Optional[Tree],
              transposed: bool = False) -> None:
    k = _np32(params["kernel"])
    w = k.transpose((3, 4, 0, 1, 2) if transposed else (4, 3, 0, 1, 2))
    if spectral:
        sd[f"{prefix}.parametrizations.weight.original"] = w
        sd[f"{prefix}.parametrizations.weight.0._u"] = _np32(spectral["u"])
        sd[f"{prefix}.parametrizations.weight.0._v"] = _np32(spectral["v"])
    else:
        sd[f"{prefix}.weight"] = w
    if "bias" in params:
        sd[f"{prefix}.bias"] = _np32(params["bias"])


def _linear_out(sd: SD, prefix: str, params: Tree,
                spectral: Optional[Tree]) -> None:
    w = _np32(params["kernel"]).T
    if spectral:
        sd[f"{prefix}.parametrizations.weight.original"] = w
        sd[f"{prefix}.parametrizations.weight.0._u"] = _np32(spectral["u"])
        sd[f"{prefix}.parametrizations.weight.0._v"] = _np32(spectral["v"])
    else:
        sd[f"{prefix}.weight"] = w
    if "bias" in params:
        sd[f"{prefix}.bias"] = _np32(params["bias"])


def _bn_out(sd: SD, prefix: str, params: Tree, stats: Tree) -> None:
    sd[f"{prefix}.weight"] = _np32(params["scale"])
    sd[f"{prefix}.bias"] = _np32(params["bias"])
    sd[f"{prefix}.running_mean"] = _np32(stats["mean"])
    sd[f"{prefix}.running_var"] = _np32(stats["var"])
    sd[f"{prefix}.num_batches_tracked"] = np.asarray(0, np.int64)


def _layernorm_out(sd: SD, prefix: str, params: Tree) -> None:
    sd[f"{prefix}.weight"] = _np32(params["scale"]).transpose(3, 0, 1, 2)
    sd[f"{prefix}.bias"] = _np32(params["bias"]).transpose(3, 0, 1, 2)


def _attention_out(sd: SD, prefix: str, params: Tree,
                   spectral: Optional[Tree]) -> None:
    spectral = spectral or {}
    for name in ("f", "g", "h", "v"):
        _conv_out(sd, f"{prefix}.{name}", params[name], spectral.get(name))
    sd[f"{prefix}.gamma"] = _np32(params["gamma"])


def _split(variables: Tree) -> Tuple[Tree, Tree, Tree]:
    return (variables.get("params", {}), variables.get("batch_stats", {}),
            variables.get("spectral", {}))


# ---------------------------------------------------------------------------
# DCGAN family (reference dcgan.py Sequential index layouts)
# ---------------------------------------------------------------------------
def export_dcgan_g(variables: Tree, cfg: Config) -> SD:
    """Inverse of convert_dcgan_g: main.{i} Sequential indices walk
    [ConvT, BN, ReLU] triples (+ SelfAttention after the res/4 stage for
    sagan), final [ConvT, Tanh] (reference dcgan.py:45-70)."""
    params, stats, spectral = _split(variables)
    sd: SD = {}
    chans = cfg.dcgan_g_channels()
    attn_res = cfg.resolution // 4
    i = ct = bn = at = 0
    res = 4
    # stem triple + stage triples
    for stage in range(len(chans)):
        _conv_out(sd, f"main.{i}", params[f"ConvTranspose3d_{ct}"], None,
                  transposed=True)
        i += 1
        _bn_out(sd, f"main.{i}", params[f"BatchNorm3d_{bn}"],
                stats[f"BatchNorm3d_{bn}"])
        i += 2  # BN, ReLU
        ct += 1
        bn += 1
        if stage > 0:
            res *= 2
        if cfg.sagan and res == attn_res and stage > 0:
            _attention_out(sd, f"main.{i}",
                           params[f"SelfAttention3d_{at}"],
                           spectral.get(f"SelfAttention3d_{at}"))
            i += 1
            at += 1
    _conv_out(sd, f"main.{i}", params[f"ConvTranspose3d_{ct}"], None,
              transposed=True)
    return sd


def export_dcgan_d(variables: Tree, cfg: Config) -> SD:
    """Inverse of convert_dcgan_d for the four variants
    (reference dcgan.py:96-182)."""
    params, _, spectral = _split(variables)
    sd: SD = {}
    chans = cfg.dcgan_d_channels()
    i = 0
    if cfg.msl:
        i += 1  # RandomCrop3D: parameterless front-end (msl.py reconstructed)
        n_stages = max(1, len(chans) - 1)
        for sn in range(n_stages):
            _conv_out(sd, f"main.{i}", params[f"SNConv3d_{sn}"],
                      spectral[f"SNConv3d_{sn}"])
            i += 2  # conv, LeakyReLU
        _conv_out(sd, f"main.{i}", params[f"SNConv3d_{n_stages}"],
                  spectral[f"SNConv3d_{n_stages}"])
    elif cfg.sngan or cfg.sagan:
        res = cfg.resolution
        at = 0
        for sn in range(len(chans)):
            _conv_out(sd, f"main.{i}", params[f"SNConv3d_{sn}"],
                      spectral[f"SNConv3d_{sn}"])
            i += 2  # conv, LeakyReLU
            res //= 2
            if cfg.sagan and res == 8:
                _attention_out(sd, f"main.{i}",
                               params[f"SelfAttention3d_{at}"],
                               spectral.get(f"SelfAttention3d_{at}"))
                i += 1
                at += 1
        _conv_out(sd, f"main.{i}", params[f"SNConv3d_{len(chans)}"],
                  spectral[f"SNConv3d_{len(chans)}"])
    else:  # WGAN default: [Conv, LayerNorm, LeakyReLU] triples
        for pc in range(len(chans)):
            _conv_out(sd, f"main.{i}", params[f"Conv3d_{pc}"], None)
            _layernorm_out(sd, f"main.{i + 1}",
                           params[f"LayerNormVolume_{pc}"])
            i += 3
        _conv_out(sd, f"main.{i}", params[f"Conv3d_{len(chans)}"], None)
    return sd


# ---------------------------------------------------------------------------
# BigGAN family (inverse of convert_biggan_*)
# ---------------------------------------------------------------------------
def _deep_block_out(sd: SD, prefix: str, params: Tree, stats: Optional[Tree],
                    spectral: Optional[Tree]) -> None:
    spectral = spectral or {}
    for c in ("conv1", "conv2", "conv3", "conv4", "conv_sc"):
        if c in params:
            _conv_out(sd, f"{prefix}.{c}", params[c], spectral.get(c))
    if stats is not None:
        for b in ("bn1", "bn2", "bn3", "bn4"):
            _bn_out(sd, f"{prefix}.{b}", params[b], stats[b])


def export_biggan_g(variables: Tree, cfg: Config) -> SD:
    params, stats, spectral = _split(variables)
    sd: SD = {}
    _linear_out(sd, "linear", params["linear"], spectral.get("linear"))
    arch = cfg.biggan_g_arch()
    for idx in range(len(arch["out_channels"])):
        if cfg.biggan:
            pairs = [(f"blocks.{2 * idx}.0", f"g{idx}_0"),
                     (f"blocks.{2 * idx + 1}.0", f"g{idx}_1")]
            attn_prefix = f"blocks.{2 * idx + 1}.1"
        else:
            pairs = [(f"blocks.{idx}.0", f"g{idx}_0")]
            attn_prefix = f"blocks.{idx}.1"
        for tname, oname in pairs:
            _deep_block_out(sd, tname, params[oname], stats[oname],
                            spectral.get(oname))
        if (cfg.sagan or cfg.biggan) and arch["attention"][
                arch["resolution"][idx]]:
            _attention_out(sd, attn_prefix, params[f"attn{idx}"],
                           spectral.get(f"attn{idx}"))
    _bn_out(sd, "output_layer.0", params["out_bn"], stats["out_bn"])
    _conv_out(sd, "output_layer.2", params["out_conv"],
              spectral.get("out_conv"))
    return sd


def export_biggan_d(variables: Tree, cfg: Config) -> SD:
    params, _, spectral = _split(variables)
    sd: SD = {}
    _conv_out(sd, "input_conv", params["input_conv"],
              spectral.get("input_conv"))
    arch = cfg.biggan_d_arch()
    for idx in range(len(arch["out_channels"])):
        if cfg.biggan:
            pairs = [(f"blocks.{idx}.0", f"d{idx}_0"),
                     (f"blocks.{idx}.1", f"d{idx}_1")]
            attn_prefix = f"blocks.{idx}.2"
        else:
            pairs = [(f"blocks.{idx}.0", f"d{idx}_0")]
            attn_prefix = f"blocks.{idx}.1"
        for tname, oname in pairs:
            _deep_block_out(sd, tname, params[oname], None,
                            spectral.get(oname))
        if (cfg.sagan or cfg.biggan) and arch["attention"][
                arch["resolution"][idx]]:
            _attention_out(sd, attn_prefix, params[f"attn{idx}"],
                           spectral.get(f"attn{idx}"))
    _linear_out(sd, "linear", params["linear"], spectral.get("linear"))
    return sd


# ---------------------------------------------------------------------------
# run-level entry
# ---------------------------------------------------------------------------
def export_state_dicts(g_vars: Tree, d_vars: Tree, cfg: Config
                       ) -> Tuple[SD, SD]:
    fam = cfg.family()
    if fam == "dcgan":
        return export_dcgan_g(g_vars, cfg), export_dcgan_d(d_vars, cfg)
    if fam == "hybrid":
        return export_biggan_g(g_vars, cfg), export_dcgan_d(d_vars, cfg)
    if fam == "biggan":
        return export_biggan_g(g_vars, cfg), export_biggan_d(d_vars, cfg)
    raise NotImplementedError(
        f"torch export for family '{fam}' not implemented (the reference's "
        "stylegan paths crash as shipped — nothing upstream loads them)")


def _empty_adam_state(n_params: int, lr: float) -> Dict[str, Any]:
    """A loadable torch.optim.Adam state dict with empty per-param state
    (torch fills moments lazily); betas match the reference
    (trainer.py:77-78)."""
    return {
        "state": {},
        "param_groups": [{
            "lr": lr, "betas": (0.0, 0.9), "eps": 1e-8, "weight_decay": 0,
            "amsgrad": False, "foreach": None, "maximize": False,
            "capturable": False, "differentiable": False, "fused": None,
            "decoupled_weight_decay": False,
            "params": list(range(n_params)),
        }],
    }


def _count_torch_params(sd: SD) -> int:
    """Trainable-param count in state_dict order (buffers excluded)."""
    skip = ("running_mean", "running_var", "num_batches_tracked", "_u", "_v")
    return sum(1 for k in sd if not k.endswith(skip))


def export_checkpoint(run_dir: str, out_dir: str) -> str:
    """Export one of OUR run dirs to the reference's on-disk layout:
    out_dir/params.pkl + out_dir/models/checkpoint.pt (keys exactly as
    reference trainer.py:153-163 writes them)."""
    import json

    import torch

    from gan3d_tpu.eval.load import _restore_raw

    cfg = Config.load(run_dir)
    raw = _restore_raw(os.path.join(run_dir, "models"))
    g_vars = {"params": raw["g_params"], **(raw.get("g_state") or {})}
    d_vars = {"params": raw["d_params"], **(raw.get("d_state") or {})}
    g_sd, d_sd = export_state_dicts(g_vars, d_vars, cfg)

    os.makedirs(os.path.join(out_dir, "models"), exist_ok=True)
    with open(os.path.join(out_dir, "params.pkl"), "wb") as f:
        pickle.dump(cfg.to_namespace(), f)

    hist = {}
    hist_path = os.path.join(run_dir, "models", "history.json")
    if os.path.isfile(hist_path):
        with open(hist_path) as f:
            hist = json.load(f)
    payload = {
        "step": int(np.asarray(raw["step"])),
        "modelG_state_dict": {k: torch.from_numpy(np.ascontiguousarray(v))
                              for k, v in g_sd.items()},
        "modelD_state_dict": {k: torch.from_numpy(np.ascontiguousarray(v))
                              for k, v in d_sd.items()},
        "optimizerG_state_dict": _empty_adam_state(
            _count_torch_params(g_sd), cfg.lrG),
        "optimizerD_state_dict": _empty_adam_state(
            _count_torch_params(d_sd), cfg.lrD),
        "lossG": hist.get("lossG", []),
        "lossD": hist.get("lossD", []),
        "fid": hist.get("fid", []),
    }
    path = os.path.join(out_dir, "models", "checkpoint.pt")
    torch.save(payload, path)
    return path
