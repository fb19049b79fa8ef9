"""One-command eval-weights validation (VERDICT r3 next #6).

The environment this framework was built in has no egress, so the two
reference metric checkpoints — MedicalNet `resnet_50.pth` (reference
eval_utils.py:54-63) and `pt_inception-2015-12-05.pth` (the pytorch_fid
wrapper's Inception-V3, eval_utils.py:65-84) — were never available, and
BASELINE.json's "3D-FID within 2%" acceptance target is converter-tested
but numerically unverified.  When the real files are at hand, this script
closes that gap in one command:

    python scripts/validate_eval_weights.py --resnet50 /path/to/resnet_50.pth
    python scripts/validate_eval_weights.py --inception /path/to/pt_inception-2015-12-05.pth
    python scripts/validate_eval_weights.py --selftest   # random-init stand-ins

For the MedicalNet file it runs: converter -> feature-map parity against a
torch transcription of the reference extractor (FID_ResNet.py:105-189, the
same oracle tests/test_fid_weights_parity.py uses) -> end-to-end fid_3d on
fixed fixtures against a torch transcription of eval_utils.py:41-52, and
prints PASS/FAIL with the deltas.

For the Inception file the strongest offline check is converter-level: key
coverage, feature parity against `pytorch_fid`'s own model if that package
is importable (it is not in this environment), and slice-FID calibration on
fixtures (identical batches -> ~0, disjoint noise -> large).
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

# Force CPU: the env var alone is overridden by TPU plugins (and metric
# numerics are fp32-on-host by reference contract anyway — eval_utils.py
# does its Frechet math on CPU numpy).
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

PASS, FAIL = "PASS", "FAIL"
_failures = []


def check(name: str, ok: bool, detail: str) -> None:
    print(f"[{PASS if ok else FAIL}] {name}: {detail}", flush=True)
    if not ok:
        _failures.append(name)


def validate_resnet50(path: str, tol_feat: float = 1e-3,
                      tol_fid_rel: float = 0.02) -> None:
    import torch

    import jax.numpy as jnp

    from gan3d_tpu.eval.fid_resnet import FIDResNet50, load_torch_weights
    from gan3d_tpu.eval.metrics import frechet_distance
    from test_fid_weights_parity import _TorchFIDResNet50

    print(f"== MedicalNet resnet_50: {path}")
    raw = torch.load(path, map_location="cpu", weights_only=False)
    sd = raw.get("state_dict", raw)
    sd = {k.removeprefix("module."): v for k, v in sd.items()}

    oracle = _TorchFIDResNet50()
    missing, unexpected = oracle.load_state_dict(sd, strict=False)
    check("state_dict coverage", not missing and not unexpected,
          f"missing={list(missing)[:3]} unexpected={list(unexpected)[:3]}"
          if (missing or unexpected) else
          f"{len(sd)} tensors map 1:1 onto the reference layout")
    oracle.eval()

    variables = load_torch_weights(path)
    model = FIDResNet50()

    rng = np.random.default_rng(0)
    x = rng.normal(size=(4, 1, 32, 32, 32)).astype(np.float32).clip(-1, 1)
    with torch.no_grad():
        ref = oracle(torch.from_numpy(x)).numpy()          # [N,2048,d,h,w]
    out = np.asarray(model.apply(variables, jnp.asarray(
        x.transpose(0, 2, 3, 4, 1))))                       # [N,d,h,w,2048]
    out = out.transpose(0, 4, 1, 2, 3)
    scale = max(1e-6, float(np.abs(ref).max()))
    delta = float(np.abs(out - ref).max()) / scale
    check("feature-map parity", delta < tol_feat,
          f"max rel delta {delta:.2e} (tol {tol_feat:g})")

    # end-to-end fid_3d on fixtures: torch transcription of
    # eval_utils.py:41-52 (mean-pool (2,3,4), classic Frechet) vs ours.
    y = rng.normal(size=(4, 1, 32, 32, 32)).astype(np.float32).clip(-1, 1)
    with torch.no_grad():
        a1 = oracle(torch.from_numpy(x)).mean(dim=(2, 3, 4)).numpy()
        a2 = oracle(torch.from_numpy(y)).mean(dim=(2, 3, 4)).numpy()
    fid_ref = frechet_distance(a1, a2)  # same host-side sqrtm as reference

    def feats(v):
        f = np.asarray(model.apply(variables, jnp.asarray(
            v.transpose(0, 2, 3, 4, 1))))
        return f.mean(axis=(1, 2, 3))

    fid_ours = frechet_distance(feats(x), feats(y))
    rel = abs(fid_ours - fid_ref) / max(1e-9, abs(fid_ref))
    check("fid_3d within 2% on fixtures", rel < tol_fid_rel,
          f"ref {fid_ref:.4f} vs ours {fid_ours:.4f} (rel delta {rel:.2%})")


def validate_inception(path: str) -> None:
    import jax.numpy as jnp

    from gan3d_tpu.eval.inception import (InceptionV3, InceptionV3Features,
                                          load_torch_weights)
    from gan3d_tpu.eval.slice_fid import SliceFID

    print(f"== pt_inception: {path}")
    variables = load_torch_weights(path)
    model = InceptionV3()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, 75, 75, 3)), jnp.float32)
    f = np.asarray(model.apply(variables, x))
    check("converted features finite", bool(np.isfinite(f).all()),
          f"pool3 features {f.shape}, range [{f.min():.3f}, {f.max():.3f}]")

    try:  # oracle only when the reference's own package is present
        from pytorch_fid.inception import InceptionV3 as TorchFIDInception
        import torch

        oracle = TorchFIDInception([3], use_fid_inception=True)
        oracle.eval()
        with torch.no_grad():
            ref = oracle(torch.from_numpy(
                np.asarray(x).transpose(0, 3, 1, 2)))[0]
            ref = ref.squeeze(-1).squeeze(-1).numpy()
        delta = float(np.abs(f - ref).max()) / max(1e-6, float(np.abs(ref).max()))
        check("feature parity vs pytorch_fid", delta < 1e-3,
              f"max rel delta {delta:.2e}")
    except ImportError:
        print("[skip] pytorch_fid not installed — feature parity vs the "
              "reference library needs it (converter-level checks only)",
              flush=True)

    feats = InceptionV3Features(path)
    sfid = SliceFID(extractor=feats, batch_size=16)
    a = rng.normal(size=(8, 16, 16, 16, 1)).astype(np.float32)
    b = (rng.normal(size=(8, 16, 16, 16, 1)) * 0.3 + 0.7).astype(np.float32)
    same = abs(sfid(a, a.copy())[0])
    diff = abs(sfid(a, b)[0])
    # identical batches must score ~0; the separation requirement is only
    # meaningful with trained weights (random-init features are near-
    # constant, so both sides are ~0 — that is a pass, not a failure).
    check("slice-FID calibration", same < 1e-3 and diff >= same - 1e-9,
          f"identical {same:.6f} vs shifted-noise {diff:.6f}"
          + ("" if diff > same + 1e-3 else
             " (no separation — expected for random-init stand-ins; "
             "re-run with real weights for the discriminative check)"))


def make_standin_resnet50(path: str) -> None:
    import torch

    from test_fid_weights_parity import _random_medicalnet

    model = _random_medicalnet()
    torch.save({"state_dict": {"module." + k: v
                               for k, v in model.state_dict().items()}}, path)


def make_standin_inception(path: str) -> None:
    import torch

    import jax
    import jax.numpy as jnp

    from gan3d_tpu.eval.inception import InceptionV3

    model = InceptionV3()
    variables = model.init(jax.random.key(0), jnp.zeros((1, 75, 75, 3)))
    sd = {}

    def walk(params, stats, prefix):
        for k, v in params.items():
            p = f"{prefix}.{k}" if prefix else k
            if k == "conv":
                sd[p + ".weight"] = torch.from_numpy(
                    np.asarray(v["kernel"]).transpose(3, 2, 0, 1).copy())
            elif k == "bn":
                sd[p + ".weight"] = torch.from_numpy(np.asarray(v["scale"]))
                sd[p + ".bias"] = torch.from_numpy(np.asarray(v["bias"]))
                st = stats[k]
                sd[p + ".running_mean"] = torch.from_numpy(
                    np.asarray(st["mean"]))
                sd[p + ".running_var"] = torch.from_numpy(
                    np.asarray(st["var"]))
            else:
                walk(v, stats[k], p)

    walk(variables["params"], variables["batch_stats"], "")
    torch.save(sd, path)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--resnet50", help="path to MedicalNet resnet_50.pth")
    ap.add_argument("--inception",
                    help="path to pt_inception-2015-12-05.pth")
    ap.add_argument("--selftest", action="store_true",
                    help="exercise both paths with random-init stand-ins "
                         "(proves the harness; real files still needed for "
                         "the acceptance target)")
    a = ap.parse_args(argv)
    if not (a.resnet50 or a.inception or a.selftest):
        ap.error("give --resnet50 and/or --inception, or --selftest")
    if a.selftest:
        with tempfile.TemporaryDirectory() as td:
            rp = os.path.join(td, "resnet_50.pth")
            ip = os.path.join(td, "pt_inception.pth")
            make_standin_resnet50(rp)
            validate_resnet50(rp)
            make_standin_inception(ip)
            validate_inception(ip)
    if a.resnet50:
        validate_resnet50(a.resnet50)
    if a.inception:
        validate_inception(a.inception)
    if _failures:
        print(f"RESULT: FAIL ({', '.join(_failures)})", flush=True)
        return 1
    print("RESULT: PASS", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
