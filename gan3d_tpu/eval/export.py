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

Families: all five — DCGAN (all four D variants), the BigGAN/SNGAN/SAGAN
deep family, and StyleGAN-1/2 (mapping/synthesis/D state_dicts in the
reference's stylegan.py:697-928 naming; 2-D noise_const buffers emitted
seeded so strict loading passes — see export_stylegan2_g). A checkpoint
exported this way loads via the reference's own resume path
(trainer.py:128-151, incl. the stylegan2 EMA-seeding at :133-134 which
re-seeds G_ema_state from modelG_state_dict).

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
# StyleGAN family (inverse of convert_stylegan2_g / convert_stylegan_d /
# convert_stylegan1_g; reference module naming from stylegan.py:697-928)
# ---------------------------------------------------------------------------
def _fc_out(sd: SD, prefix: str, params: Tree, key: str = "weight") -> None:
    """Our FullyConnectedLayer/Dense [I,O] -> torch Linear-style [O,I]."""
    sd[f"{prefix}.weight"] = _np32(params[key]).T
    if "bias" in params:
        sd[f"{prefix}.bias"] = _np32(params["bias"])


def _style_conv_w_out(sd: SD, prefix: str, params: Tree) -> None:
    """Our [k,k,k,I,O] raw style-conv weight -> torch [O,I,k,k,k]."""
    sd[f"{prefix}.weight"] = _np32(params["weight"]).transpose(4, 3, 0, 1, 2)
    if "bias" in params:
        sd[f"{prefix}.bias"] = _np32(params["bias"])


def export_stylegan2_g(variables: Tree, cfg: Config) -> SD:
    """Inverse of convert_stylegan2_g (reference stylegan.py:697-718):
    mapping.fc0..7 + w_avg buffer; synthesis.b{res} blocks with const /
    conv0 / conv1 / torgb (affine + raw weight + bias + noise_strength).

    The reference registers a 2-D [res, res] `noise_const` buffer per
    SynthesisLayer (stylegan.py:515) that our model does not carry (we
    sample proper 3-D noise volumes; quirk documented in
    models/stylegan/layers.py) — strict torch loading needs the keys, so we
    emit seeded standard-normal buffers, matching the reference's own
    fresh-init semantics (they are only read in noise_mode='const')."""
    params = variables.get("params", {})
    moving = variables.get("moving", {})
    sd: SD = {}
    for fc, p in sorted(params.get("mapping", {}).items()):
        _fc_out(sd, f"mapping.{fc}", p)
    w_avg = moving.get("mapping", {}).get("w_avg")
    sd["mapping.w_avg"] = (_np32(w_avg) if w_avg is not None
                           else np.zeros((512,), np.float32))

    rng = np.random.default_rng(0)
    syn = params.get("synthesis", {})
    for bname in sorted(syn, key=lambda b: int(b[1:])):
        blk = syn[bname]
        res = int(bname[1:])
        if "const" in blk:  # ours [res,res,res,C] -> torch [C,res,res,res]
            sd[f"synthesis.{bname}.const"] = \
                _np32(blk["const"]).transpose(3, 0, 1, 2)
        for lname in ("conv0", "conv1", "torgb"):
            if lname not in blk:
                continue
            prefix = f"synthesis.{bname}.{lname}"
            layer = blk[lname]
            _style_conv_w_out(sd, prefix, layer)
            _fc_out(sd, f"{prefix}.affine", layer["affine"])
            if "noise_strength" in layer:  # SynthesisLayer, not OutBlock
                sd[f"{prefix}.noise_strength"] = _np32(
                    layer["noise_strength"])
                sd[f"{prefix}.noise_const"] = rng.standard_normal(
                    (res, res)).astype(np.float32)
    return sd


def export_stylegan_d(variables: Tree, cfg: Config) -> SD:
    """Inverse of convert_stylegan_d (reference stylegan.py:883-928):
    resnet blocks b{res} (fromrgb on the first, conv0, conv1 down, biasless
    skip) + epilogue b4 (conv, fc over the flattened 4^3 volume, out). The
    epilogue fc converts our NDHWC flatten order back to torch's NCDHW."""
    params = variables.get("params", {})
    sd: SD = {}
    for bname, blk in params.items():
        for lname in ("fromrgb", "conv0", "conv1", "skip", "conv"):
            if lname in blk:
                _style_conv_w_out(sd, f"{bname}.{lname}", blk[lname])
        for lname in ("fc", "out"):
            if lname not in blk:
                continue
            w = _np32(blk[lname]["weight"]).T  # ours [in,O] -> [O,in]
            if lname == "fc":
                o, flat = w.shape
                c = flat // 64
                w = w.reshape(o, 4, 4, 4, c).transpose(0, 4, 1, 2, 3)
                w = w.reshape(o, flat)
            sd[f"{bname}.{lname}.weight"] = w
            if "bias" in blk[lname]:
                sd[f"{bname}.{lname}.bias"] = _np32(blk[lname]["bias"])
    return sd


def export_stylegan1_g(variables: Tree, cfg: Config) -> SD:
    """Inverse of convert_stylegan1_g (reference stylegan.py:969-1148):
    latentMapping Sequential Linears at even indices <- map0..7; C{i}.0 /
    C_out.0 biasless convs; A{i} affine Linears."""
    params = variables.get("params", {})
    sd: SD = {}
    for name, p in params.items():
        if name.startswith("map"):
            _fc_out(sd, f"latentMapping.{2 * int(name[3:])}", p,
                    key="kernel")
        elif name == "C_out" or name.startswith("C"):
            sd[f"{name}.0.weight"] = _np32(p["kernel"]).transpose(
                4, 3, 0, 1, 2)
        elif name.startswith("A"):
            _fc_out(sd, name, p, key="kernel")
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
    if fam == "stylegan2":
        return (export_stylegan2_g(g_vars, cfg),
                export_stylegan_d(d_vars, cfg))
    if fam == "stylegan":
        return (export_stylegan1_g(g_vars, cfg),
                export_stylegan_d(d_vars, cfg))
    raise NotImplementedError(
        f"torch export for family '{fam}' not implemented")


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
    skip = ("running_mean", "running_var", "num_batches_tracked", "_u", "_v",
            "w_avg", "noise_const")
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
        # np.array (not ascontiguousarray, which promotes 0-d to (1,) and
        # would corrupt scalar params like stylegan2's noise_strength)
        "modelG_state_dict": {k: torch.from_numpy(np.array(v))
                              for k, v in g_sd.items()},
        "modelD_state_dict": {k: torch.from_numpy(np.array(v))
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
