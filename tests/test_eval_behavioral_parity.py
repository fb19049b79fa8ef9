"""Eval-stack behavioral parity vs torch transcriptions (VERDICT r2 #3).

Method mirrors tests/test_behavioral_parity.py's training lockstep, applied
to the eval stack: identical weights on both sides (ours exported to
reference-layout torch modules via the oracle-tested eval/export.py),
identical data batches, and an identical noise schedule (the torch
transcription consumes the exact jax.random-generated noise arrays our
implementations draw), then assert the DECISIONS agree within fp tolerance:

- the tournament decision bound (reference tournament.py:35-55), in both
  our accumulate-all-batches default and the reference's last-batch quirk
  (--compat_last_batch), and the win rate (tournament.py:57-75);
- the eval per-batch metric loop (reference eval.py:51-70) -> stats npz.

The dcgan WGAN variant is used (BN generator, LayerNorm discriminator) so
neither side carries spectral-norm power-iteration state, whose
train-mode update semantics differ legitimately between the frameworks.
"""

import os

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from gan3d_tpu.config import Config
from gan3d_tpu.eval.export import export_dcgan_d, export_dcgan_g
from gan3d_tpu.models import build_models

from tests.test_behavioral_parity import build_torch_dcgan_d_wgan
from tests.test_convert import build_torch_dcgan_g

CFG = dict(dcgan=True, resolution=16, z_size=8, filterG=4, filterD=4,
           compute_dtype="float32")


@pytest.fixture(scope="module")
def matched_models():
    """(our G/D + vars, torch G/D with the same exported weights)."""
    cfg = Config(**CFG)
    G, D = build_models(cfg)
    key = jax.random.PRNGKey(7)
    gv = jax.jit(G.init)({"params": key}, jnp.zeros((2, cfg.z_size)))
    dv = jax.jit(D.init)(
        {"params": jax.random.fold_in(key, 1)},
        jnp.zeros((2, cfg.resolution, cfg.resolution, cfg.resolution, 1)))
    tg = build_torch_dcgan_g(cfg)
    tg.load_state_dict(
        {k[5:]: torch.from_numpy(np.ascontiguousarray(v))
         for k, v in export_dcgan_g(gv, cfg).items()}, strict=True)
    td = build_torch_dcgan_d_wgan(cfg)
    td.load_state_dict(
        {k[5:]: torch.from_numpy(np.ascontiguousarray(v))
         for k, v in export_dcgan_d(dv, cfg).items()}, strict=True)
    # reference eval/tournament never call .eval(): train-mode BN
    tg.train()
    td.train()
    return cfg, G, gv, D, dv, tg, td


def _torch_score(td, x_np):
    """D(x) for NDHW numpy volumes, reference NCDHW layout."""
    with torch.no_grad():
        return td(torch.from_numpy(
            x_np[:, None].copy())).numpy().reshape(-1)


def _torch_sample(tg, cfg, noise_np):
    """G(z) volumes back in our NDHWC layout."""
    with torch.no_grad():
        out = tg(torch.from_numpy(noise_np.copy()).reshape(
            noise_np.shape[0], cfg.z_size, 1, 1, 1)).numpy()
    return np.moveaxis(out, 1, -1)


def _torch_decision_bound(td, tg, cfg, batches, key, compat):
    """Transcription of reference tournament.py:35-55 consuming OUR noise
    schedule: rs/fs reset per batch in compat mode (the reference's
    accumulator-reset quirk at :38), accumulated otherwise."""
    rs, fs = [], []
    for x in batches:
        if compat:
            rs, fs = [], []
        key, kz = jax.random.split(key)
        noise = np.asarray(jax.random.normal(kz, (x.shape[0], cfg.z_size)))
        rs.append(_torch_score(td, x))
        fs.append(_torch_score(td, np.moveaxis(
            _torch_sample(tg, cfg, noise), -1, 1)[:, 0]))
    return float((np.concatenate(rs).mean() + np.concatenate(fs).mean())
                 / 2.0)


@pytest.mark.parametrize("compat", [False, True],
                         ids=["accumulate", "compat_last_batch"])
def test_tournament_decision_bound_parity(matched_models, compat):
    from gan3d_tpu.cli.tournament import get_decision_bound
    from gan3d_tpu.eval.load import make_discriminator_fn, make_sampler

    cfg, G, gv, D, dv, tg, td = matched_models
    rng = np.random.default_rng(11)
    batches = [rng.normal(size=(4, 16, 16, 16)).astype(np.float32),
               rng.normal(size=(2, 16, 16, 16)).astype(np.float32)]

    score = make_discriminator_fn(cfg, D, dv)
    sample = make_sampler(cfg, G, gv)
    key = jax.random.key(3)
    ours = get_decision_bound(score, sample, cfg.z_size, list(batches),
                              key, compat_last_batch=compat)
    ref = _torch_decision_bound(td, tg, cfg, batches, key, compat)
    assert ours == pytest.approx(ref, abs=2e-4)
    if not compat:
        # the two modes must genuinely differ on this data, or the compat
        # flag isn't exercising the quirk
        ref_compat = _torch_decision_bound(td, tg, cfg, batches, key, True)
        assert abs(ref - ref_compat) > 1e-7


def test_tournament_win_rate_parity(matched_models):
    from gan3d_tpu.cli.tournament import play_round
    from gan3d_tpu.eval.load import make_discriminator_fn, make_sampler

    cfg, G, gv, D, dv, tg, td = matched_models
    score = make_discriminator_fn(cfg, D, dv)
    sample = make_sampler(cfg, G, gv)
    bound = 0.0
    key = jax.random.key(5)
    batch = 8
    ours = play_round(score, sample, cfg.z_size, bound, batch, key,
                      rounds=2)

    # transcription of reference tournament.py:57-75 with our key schedule
    wins = 0
    k = key
    for _ in range(2):
        k, kz = jax.random.split(k)
        noise = np.asarray(jax.random.normal(kz, (batch, cfg.z_size)))
        f = _torch_score(td, np.moveaxis(
            _torch_sample(tg, cfg, noise), -1, 1)[:, 0])
        wins += int((f > bound).sum())
    ref = wins / (batch * 2)
    assert ours == ref  # a > threshold count: must match exactly


def test_eval_metric_loop_parity(matched_models, tmp_path):
    """Transcribe the reference eval.py:51-70 per-batch loop (torch G on
    our noise schedule + the shared seed-deterministic metric stand-ins)
    and require our cli.eval stats npz to match it."""
    from gan3d_tpu.cli import eval as eval_cli
    from gan3d_tpu.data.loader import Loader
    from gan3d_tpu.data.datasets import open_dataset
    from gan3d_tpu.eval import metrics as M
    from gan3d_tpu.eval.fid_resnet import get_fid_model
    from gan3d_tpu.eval.slice_fid import SliceFID
    from gan3d_tpu.train import Trainer
    from gan3d_tpu.data.datasets import NpzDataset

    cfg0, *_ = matched_models
    rng = np.random.default_rng(17)
    data_path = str(tmp_path / "test.npz")
    np.savez(data_path, X=rng.normal(size=(8, 16, 16, 16))
             .astype(np.float32).clip(-1, 1))

    # one tiny trained run dir (our side loads it via load_run)
    run_dir = str(tmp_path / "m0")
    cfg = Config(**{**CFG, **dict(batch_size=4, niters=1, iterD=1,
                                  steps_per_log=10, steps_per_img_log=10,
                                  steps_per_ckpt=1, log_dir=run_dir,
                                  data_loader_workers=1, num_devices=1)})
    Trainer(NpzDataset(data_path), cfg).train()

    out_dir = str(tmp_path / "eval_out")
    eval_cli.main(["--data_path", data_path, "--batch_size", "4",
                   "--seed", "0", "--log_dir", out_dir, "-l",
                   str(tmp_path / "m"), "--n_seeds", "1",
                   "--fid_checkpoint", ""])
    stats = np.load(os.path.join(out_dir, "m_stats.npz"))

    # ---- torch-side transcription of the same loop ----
    from gan3d_tpu.eval.load import load_run

    cfg1, G1, _, gv1, _ = load_run(run_dir)
    tg = build_torch_dcgan_g(cfg1)
    tg.load_state_dict(
        {k[5:]: torch.from_numpy(np.ascontiguousarray(v))
         for k, v in export_dcgan_g(gv1, cfg1).items()}, strict=True)
    tg.train()

    _, _, fid_features = get_fid_model(None)  # seed-deterministic stand-in
    sfid = SliceFID(weights_path=None)
    loader = Loader(open_dataset(data_path), 4, seed=0)
    key = jax.random.key(0)
    exp = {k: [] for k in ("ssim", "mmds", "fid", "fid_ax", "fid_cor",
                           "fid_sag")}
    for data in loader:
        x1 = data[..., None]
        key, kz = jax.random.split(key)
        noise = np.asarray(jax.random.normal(kz, (data.shape[0],
                                                  cfg1.z_size)))
        x2 = _torch_sample(tg, cfg1, noise)
        exp["ssim"].append(M.ms_ssim_3d(x1, x2))
        exp["fid"].append(M.fid_3d(fid_features, x1, x2))
        exp["mmds"].append(float(M.mmd(x1, x2)))
        fa, fc, fs = sfid(x1, x2)
        exp["fid_ax"].append(fa)
        exp["fid_cor"].append(fc)
        exp["fid_sag"].append(fs)

    for k in exp:
        np.testing.assert_allclose(
            stats[k], np.asarray(exp[k]), rtol=2e-3, atol=2e-3,
            err_msg=f"eval loop metric wiring diverges at '{k}'")
