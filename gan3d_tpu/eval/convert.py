"""Reference checkpoint interop: torch state_dicts -> flax variables.

The reference persists runs as `params.pkl` + `models/checkpoint.pt` with
modelG/modelD state_dicts (reference: trainer.py:153-163), optionally under
DataParallel's `module.` prefix. These converters rebuild our variable trees
for the DCGAN and BigGAN families so reference-trained models drop straight
into this framework's eval / tournament CLIs.

Layout mappings (torch -> flax):
- Conv3d weight [O, I, kd, kh, kw]        -> kernel [kd, kh, kw, I, O]
- ConvTranspose3d weight [I, O, kd,kh,kw] -> kernel [kd, kh, kw, I, O]
- Linear weight [O, I]                    -> kernel [I, O]
- BatchNorm weight/bias/running_*         -> scale/bias + batch_stats
- LayerNorm [C, D, H, W] affine           -> [D, H, W, C]
- spectral_norm parametrization (original weight + _u/_v power-iteration
  state) -> kernel + `spectral` collection {u, v} (our matrix view matches
  torch's element order, so u/v transfer verbatim — see nn/layers.py)

The BigGAN G first linear needs no column permutation: our forward reshapes
its output channel-major exactly like the reference (models/biggan.py).
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, List, Tuple

import jax.numpy as jnp
import numpy as np

from gan3d_tpu.config import Config

Tree = Dict[str, Any]


# ---------------------------------------------------------------------------
# torch state_dict normalization
# ---------------------------------------------------------------------------
def strip_module_prefix(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    return {(k[7:] if k.startswith("module.") else k): v
            for k, v in sd.items()}


def group_modules(sd: Dict[str, np.ndarray]) -> Dict[str, Dict[str, np.ndarray]]:
    """Group flat keys by owning module, folding spectral-norm
    parametrizations into {weight, u, v}."""
    mods: Dict[str, Dict[str, np.ndarray]] = {}
    for k, v in sd.items():
        m = re.match(r"(.*)\.parametrizations\.weight\.original$", k)
        if m:
            mods.setdefault(m.group(1), {})["weight"] = v
            continue
        m = re.match(r"(.*)\.parametrizations\.weight\.0\._(u|v)$", k)
        if m:
            mods.setdefault(m.group(1), {})[m.group(2)] = v
            continue
        if "." in k:
            prefix, leaf = k.rsplit(".", 1)
        else:
            prefix, leaf = "", k
        mods.setdefault(prefix, {})[leaf] = v
    return mods


def _np(sd_val) -> np.ndarray:
    """Materialize a state_dict value as an OWNED numpy array.

    Must copy: torch `.numpy()` shares the tensor's buffer, and JAX CPU
    zero-copies numpy arrays — without the copy the converted flax variables
    would alias the live torch parameters and silently change whenever the
    torch model trains or mutates in place."""
    v = sd_val.numpy() if hasattr(sd_val, "numpy") else sd_val
    return np.array(v)


def _conv(m: Dict[str, np.ndarray], transposed: bool = False
          ) -> Tuple[Tree, Tree]:
    """-> (params, spectral) for one conv module."""
    w = _np(m["weight"])
    perm = (2, 3, 4, 0, 1) if transposed else (2, 3, 4, 1, 0)
    params: Tree = {"kernel": jnp.asarray(w.transpose(perm))}
    if "bias" in m:
        params["bias"] = jnp.asarray(_np(m["bias"]))
    spectral: Tree = {}
    if "u" in m:
        spectral = {"u": jnp.asarray(_np(m["u"])),
                    "v": jnp.asarray(_np(m["v"]))}
    return params, spectral


def _linear(m: Dict[str, np.ndarray]) -> Tuple[Tree, Tree]:
    params: Tree = {"kernel": jnp.asarray(_np(m["weight"]).T)}
    if "bias" in m:
        params["bias"] = jnp.asarray(_np(m["bias"]))
    spectral: Tree = {}
    if "u" in m:
        spectral = {"u": jnp.asarray(_np(m["u"])),
                    "v": jnp.asarray(_np(m["v"]))}
    return params, spectral


def _bn(m: Dict[str, np.ndarray]) -> Tuple[Tree, Tree]:
    params = {"scale": jnp.asarray(_np(m["weight"])),
              "bias": jnp.asarray(_np(m["bias"]))}
    stats = {"mean": jnp.asarray(_np(m["running_mean"])),
             "var": jnp.asarray(_np(m["running_var"]))}
    return params, stats


def _layernorm(m: Dict[str, np.ndarray]) -> Tree:
    return {"scale": jnp.asarray(_np(m["weight"]).transpose(1, 2, 3, 0)),
            "bias": jnp.asarray(_np(m["bias"]).transpose(1, 2, 3, 0))}


def _attention(mods: Dict[str, Dict[str, np.ndarray]], prefix: str
               ) -> Tuple[Tree, Tree]:
    params: Tree = {}
    spectral: Tree = {}
    for name in ("f", "g", "h", "v"):
        p, s = _conv(mods[f"{prefix}.{name}"])
        params[name] = p
        if s:
            spectral[name] = s
    params["gamma"] = jnp.asarray(_np(mods[prefix]["gamma"]))
    return params, spectral


# ---------------------------------------------------------------------------
# DCGAN family
# ---------------------------------------------------------------------------
def _ordered_indices(mods, prefix="main") -> List[int]:
    idx = sorted({int(m.group(1))
                  for k in mods
                  for m in [re.match(rf"{prefix}\.(\d+)$", k)] if m})
    return idx


def convert_dcgan_g(sd: Dict[str, np.ndarray], cfg: Config) -> Tree:
    """DCGAN G Sequential: ConvTranspose/BN stacks (+ attention for sagan).

    Our flax auto-names count per class in creation order
    (ConvTranspose3d_0.., BatchNorm3d_0.., SelfAttention3d_0), matching the
    Sequential's module order type-wise.
    """
    mods = group_modules(strip_module_prefix(sd))
    params: Tree = {}
    stats: Tree = {}
    spectral: Tree = {}
    ct = bn = at = 0
    for i in _ordered_indices(mods):
        m = mods[f"main.{i}"]
        if "running_mean" in m:
            p, s = _bn(m)
            params[f"BatchNorm3d_{bn}"] = p
            stats[f"BatchNorm3d_{bn}"] = s
            bn += 1
        elif "weight" in m and _np(m["weight"]).ndim == 5:
            p, s = _conv(m, transposed=True)
            params[f"ConvTranspose3d_{ct}"] = p
            ct += 1
    # sagan attention lives at module scope main.{i} with submodules
    for k in list(mods):
        m = re.match(r"main\.(\d+)\.f$", k)
        if m:
            p, s = _attention(mods, f"main.{m.group(1)}")
            params[f"SelfAttention3d_{at}"] = p
            if s:
                spectral[f"SelfAttention3d_{at}"] = s
            at += 1
    out: Tree = {"params": params, "batch_stats": stats}
    if spectral:
        out["spectral"] = spectral
    return out


def convert_dcgan_d(sd: Dict[str, np.ndarray], cfg: Config) -> Tree:
    mods = group_modules(strip_module_prefix(sd))
    params: Tree = {}
    spectral: Tree = {}
    stats: Tree = {}
    sn = pc = ln = at = 0
    for i in _ordered_indices(mods):
        key = f"main.{i}"
        m = mods.get(key, {})
        if f"{key}.f" in mods:  # attention block
            p, s = _attention(mods, key)
            params[f"SelfAttention3d_{at}"] = p
            if s:
                spectral[f"SelfAttention3d_{at}"] = s
            at += 1
        elif "u" in m:  # spectral-normed conv
            p, s = _conv(m)
            params[f"SNConv3d_{sn}"] = p
            spectral[f"SNConv3d_{sn}"] = s
            sn += 1
        elif "weight" in m and _np(m["weight"]).ndim == 5:  # plain conv
            p, _ = _conv(m)
            params[f"Conv3d_{pc}"] = p
            pc += 1
        elif "weight" in m and _np(m["weight"]).ndim == 4:  # LayerNorm vol
            params[f"LayerNormVolume_{ln}"] = _layernorm(m)
            ln += 1
    out: Tree = {"params": params}
    if spectral:
        out["spectral"] = spectral
    if stats:
        out["batch_stats"] = stats
    return out


# ---------------------------------------------------------------------------
# BigGAN family
# ---------------------------------------------------------------------------
def _deep_block(mods, prefix: str, g_block: bool) -> Tuple[Tree, Tree, Tree]:
    params: Tree = {}
    stats: Tree = {}
    spectral: Tree = {}
    for c in ("conv1", "conv2", "conv3", "conv4", "conv_sc"):
        if f"{prefix}.{c}" in mods:
            p, s = _conv(mods[f"{prefix}.{c}"])
            params[c] = p
            if s:
                spectral[c] = s
    if g_block:
        for b in ("bn1", "bn2", "bn3", "bn4"):
            p, s = _bn(mods[f"{prefix}.{b}"])
            params[b] = p
            stats[b] = s
    return params, stats, spectral


def convert_biggan_g(sd: Dict[str, np.ndarray], cfg: Config) -> Tree:
    mods = group_modules(strip_module_prefix(sd))
    params: Tree = {}
    stats: Tree = {}
    spectral: Tree = {}

    p, s = _linear(mods["linear"])
    params["linear"] = p
    if s:
        spectral["linear"] = s

    n_stages = len(cfg.biggan_g_arch()["out_channels"])
    attn = cfg.biggan_g_arch()["attention"]
    res = cfg.biggan_g_arch()["resolution"]
    for idx in range(n_stages):
        if cfg.biggan:
            t0, t1 = f"blocks.{2 * idx}.0", f"blocks.{2 * idx + 1}.0"
            ours = [(t0, f"g{idx}_0"), (t1, f"g{idx}_1")]
            attn_list = f"blocks.{2 * idx + 1}.1"
        else:
            ours = [(f"blocks.{idx}.0", f"g{idx}_0")]
            attn_list = f"blocks.{idx}.1"
        for tname, oname in ours:
            p, st, sp = _deep_block(mods, tname, g_block=True)
            params[oname] = p
            stats[oname] = st
            if sp:
                spectral[oname] = sp
        if (cfg.sagan or cfg.biggan) and attn[res[idx]]:
            p, sp = _attention(mods, attn_list)
            params[f"attn{idx}"] = p
            if sp:
                spectral[f"attn{idx}"] = sp

    p, st = _bn(mods["output_layer.0"])
    params["out_bn"] = p
    stats["out_bn"] = st
    p, sp = _conv(mods["output_layer.2"])
    params["out_conv"] = p
    if sp:
        spectral["out_conv"] = sp

    out: Tree = {"params": params, "batch_stats": stats}
    if spectral:
        out["spectral"] = spectral
    return out


def convert_biggan_d(sd: Dict[str, np.ndarray], cfg: Config) -> Tree:
    mods = group_modules(strip_module_prefix(sd))
    params: Tree = {}
    spectral: Tree = {}

    p, s = _conv(mods["input_conv"])
    params["input_conv"] = p
    if s:
        spectral["input_conv"] = s

    arch = cfg.biggan_d_arch()
    for idx in range(len(arch["out_channels"])):
        if cfg.biggan:
            pairs = [(f"blocks.{idx}.0", f"d{idx}_0"),
                     (f"blocks.{idx}.1", f"d{idx}_1")]
            attn_list = f"blocks.{idx}.2"
        else:
            pairs = [(f"blocks.{idx}.0", f"d{idx}_0")]
            attn_list = f"blocks.{idx}.1"
        for tname, oname in pairs:
            p, _, sp = _deep_block(mods, tname, g_block=False)
            params[oname] = p
            if sp:
                spectral[oname] = sp
        if (cfg.sagan or cfg.biggan) and arch["attention"][
                arch["resolution"][idx]]:
            p, sp = _attention(mods, attn_list)
            params[f"attn{idx}"] = p
            if sp:
                spectral[f"attn{idx}"] = sp

    p, s = _linear(mods["linear"])
    params["linear"] = p
    if s:
        spectral["linear"] = s

    out: Tree = {"params": params}
    if spectral:
        out["spectral"] = spectral
    return out


# ---------------------------------------------------------------------------
# Run-level entry
# ---------------------------------------------------------------------------
def convert_checkpoint(ckpt_path: str, cfg: Config) -> Tuple[Tree, Tree]:
    """Reference models/checkpoint.pt -> (g_vars, d_vars)."""
    import torch

    state = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    g_sd = {k: _np(v) for k, v in state["modelG_state_dict"].items()}
    d_sd = {k: _np(v) for k, v in state["modelD_state_dict"].items()}

    fam = cfg.family()
    if fam == "dcgan":
        return convert_dcgan_g(g_sd, cfg), convert_dcgan_d(d_sd, cfg)
    if fam == "hybrid":
        return convert_biggan_g(g_sd, cfg), convert_dcgan_d(d_sd, cfg)
    if fam == "biggan":
        return convert_biggan_g(g_sd, cfg), convert_biggan_d(d_sd, cfg)
    if fam == "stylegan2":
        return (convert_stylegan2_g(g_sd, cfg),
                convert_stylegan_d(d_sd, cfg))
    if fam == "stylegan":
        return (convert_stylegan1_g(g_sd, cfg),
                convert_stylegan_d(d_sd, cfg))
    raise NotImplementedError(
        f"reference-checkpoint conversion for family '{fam}' not implemented")


def load_reference_run(path: str):
    """Load a REFERENCE run dir (params.pkl + models/checkpoint.pt) into
    (cfg, G, D, g_vars, d_vars) for our eval/tournament CLIs."""
    from gan3d_tpu.models import build_models

    cfg = Config.load(path)  # reads params.pkl when no params.json
    G, D = build_models(cfg)
    g_vars, d_vars = convert_checkpoint(
        os.path.join(path, "models", "checkpoint.pt"), cfg)
    return cfg, G, D, g_vars, d_vars


# ---------------------------------------------------------------------------
# StyleGAN family
# ---------------------------------------------------------------------------
def _fc(m: Dict[str, np.ndarray], key: str = "weight") -> Tree:
    """torch Linear weight [O,I] -> [I,O]; `key` is the flax param name
    ("weight" for FullyConnectedLayer, "kernel" for flax Dense)."""
    out: Tree = {key: jnp.asarray(_np(m["weight"]).T)}
    if "bias" in m:
        out["bias"] = jnp.asarray(_np(m["bias"]))
    return out


def _style_conv_weight(m: Dict[str, np.ndarray]) -> Tree:
    """SynthesisLayer/Conv3dLayer raw weight [O,I,k,k,k] -> [k,k,k,I,O]."""
    out: Tree = {"weight": jnp.asarray(
        _np(m["weight"]).transpose(2, 3, 4, 1, 0))}
    if "bias" in m:
        out["bias"] = jnp.asarray(_np(m["bias"]))
    return out


def convert_stylegan2_g(sd: Dict[str, np.ndarray], cfg: Config) -> Tree:
    """StyleGAN2 Generator (reference stylegan.py:697-718): mapping fc0..7 +
    w_avg buffer; synthesis blocks b4..bR with const / conv0 / conv1 / torgb
    (affine + modulated weight + bias + noise_strength). The reference's 2-D
    noise_const buffers are skipped (ours are proper 3-D volumes, quirk
    documented in models/stylegan/layers.py)."""
    mods = group_modules(strip_module_prefix(sd))
    params: Tree = {"mapping": {}, "synthesis": {}}
    moving: Tree = {"mapping": {}}

    for name, m in mods.items():
        if not name:
            continue
        parts = name.split(".")
        if parts[0] == "mapping" and len(parts) == 2 and parts[1].startswith("fc"):
            params["mapping"][parts[1]] = _fc(m)
    if "mapping" in mods and "w_avg" in mods["mapping"]:
        moving["mapping"]["w_avg"] = jnp.asarray(_np(mods["mapping"]["w_avg"]))
    else:
        moving["mapping"]["w_avg"] = jnp.zeros((512,), jnp.float32)

    import re as _re

    for name, m in mods.items():
        bm = _re.match(r"synthesis\.(b\d+)$", name)
        if bm and "const" in m:
            params["synthesis"].setdefault(bm.group(1), {})["const"] = \
                jnp.asarray(_np(m["const"]).transpose(1, 2, 3, 0))
        lm = _re.match(r"synthesis\.(b\d+)\.(conv0|conv1|torgb)$", name)
        if lm:
            blk = params["synthesis"].setdefault(lm.group(1), {})
            layer = _style_conv_weight(m)
            if "noise_strength" in m:
                layer["noise_strength"] = jnp.asarray(
                    _np(m["noise_strength"]))
            blk[lm.group(2)] = layer
        am = _re.match(r"synthesis\.(b\d+)\.(conv0|conv1|torgb)\.affine$",
                       name)
        if am:
            blk = params["synthesis"].setdefault(am.group(1), {})
            blk.setdefault(am.group(2), {})["affine"] = _fc(m)
    return {"params": params, "moving": moving}


def convert_stylegan_d(sd: Dict[str, np.ndarray], cfg: Config) -> Tree:
    """StyleGAN Discriminator (reference stylegan.py:883-928): resnet blocks
    b{res} (fromrgb on the first, conv0, conv1 down, skip) + epilogue b4
    (conv, fc over the flattened 4^3 volume, out). The epilogue fc's input
    order converts from torch's NCDHW flatten to our NDHWC flatten."""
    mods = group_modules(strip_module_prefix(sd))
    params: Tree = {}
    import re as _re

    for name, m in mods.items():
        bm = _re.match(r"(b\d+)\.(fromrgb|conv0|conv1|skip|conv)$", name)
        if bm:
            params.setdefault(bm.group(1), {})[bm.group(2)] = \
                _style_conv_weight(m)
        fm = _re.match(r"(b\d+)\.(fc|out)$", name)
        if fm:
            w = _np(m["weight"])  # [O, in]
            if fm.group(2) == "fc":
                o, flat = w.shape
                c = flat // 64
                w = w.reshape(o, c, 4, 4, 4).transpose(0, 2, 3, 4, 1)
                w = w.reshape(o, flat)
            layer: Tree = {"weight": jnp.asarray(w.T)}
            if "bias" in m:
                layer["bias"] = jnp.asarray(_np(m["bias"]))
            params.setdefault(fm.group(1), {})[fm.group(2)] = layer
    return {"params": params}


def convert_stylegan1_g(sd: Dict[str, np.ndarray], cfg: Config) -> Tree:
    """StyleGAN-1 generator (reference stylegan.py:969-1148): latentMapping
    Sequential of Linears at even indices -> map0..7; C{i}.0 convs; A{i}
    affines; C_out.0."""
    mods = group_modules(strip_module_prefix(sd))
    params: Tree = {}
    import re as _re

    for name, m in mods.items():
        lm = _re.match(r"latentMapping\.(\d+)$", name)
        if lm:
            params[f"map{int(lm.group(1)) // 2}"] = _fc(m, key="kernel")
            continue
        cm = _re.match(r"C(\d+|_out)\.0$", name)
        if cm:
            cname = "C_out" if cm.group(1) == "_out" else f"C{cm.group(1)}"
            params[cname] = {"kernel": jnp.asarray(
                _np(m["weight"]).transpose(2, 3, 4, 1, 0))}
            continue
        am = _re.match(r"A(\d+)$", name)
        if am:
            params[name] = _fc(m, key="kernel")
    return {"params": params}
