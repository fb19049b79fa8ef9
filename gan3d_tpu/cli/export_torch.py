"""Export one of our run dirs to the reference's torch on-disk format.

Writes `out_dir/params.pkl` + `out_dir/models/checkpoint.pt` with exactly
the keys the reference's trainer writes (trainer.py:153-163), so reference
tooling (its eval.py / tournament.py / any torch code around those
state_dicts) loads the run directly. The inverse of the reference->here
interop that cli/eval.py and cli/tournament.py already perform.

    python -m gan3d_tpu.cli.export_torch --log_dir run --out run_torch
"""

from __future__ import annotations

import argparse


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--log_dir", required=True, help="our run dir "
                   "(params.json + models/ Orbax checkpoint)")
    p.add_argument("--out", required=True,
                   help="output dir (reference run-dir layout)")
    a = p.parse_args()

    from gan3d_tpu.eval.export import export_checkpoint

    path = export_checkpoint(a.log_dir, a.out)
    print(f"wrote {path} (+ params.pkl)", flush=True)


if __name__ == "__main__":
    main()
