"""Render the marathon run's training curves from its CLI logs.

Parses the `[step|niters]\tD(x): ...\tD(G(z)): a|g\tFID f` lines the
trainer prints (trainer.py log_train — the reference's format,
trainer.py:108-110; under hinge loss D(x)/D(G(z)) are the loss components
E[relu(1-D(x))] / E[relu(1+D(G(z)))], and g is -E[D(G(z))]) and writes a
three-panel PNG: D hinge components, G loss, in-loop slice FID
(random-feature stand-in), with the kill/resume step marked.

Usage: python scripts/plot_marathon.py LOG_A [LOG_B ...] --out curves.png
       [--resume-step N]
"""

from __future__ import annotations

import argparse
import re

LINE = re.compile(r"^\[(\d+)\|\d+\]\tD\(x\): ([-\d.a-z]+)\t"
                  r"D\(G\(z\)\): ([-\d.a-z]+)\|([-\d.a-z]+)\tFID ([-\d.a-z]+)")

# dataviz skill reference palette, light mode, categorical slots 1-2 in
# fixed order (pre-validated instance; node absent in this image so the
# validator could not be re-run here).
BLUE, ORANGE = "#2a78d6", "#eb6834"
INK, INK2, GRID = "#0b0b0b", "#52514e", "#e7e6e3"


def parse(paths):
    rows = {}
    for path in paths:
        with open(path) as f:
            for line in f:
                m = LINE.match(line)
                if m:
                    step = int(m.group(1))
                    rows[step] = tuple(float(m.group(i)) for i in (2, 3, 4, 5))
    steps = sorted(rows)
    cols = list(zip(*(rows[s] for s in steps)))
    return steps, cols


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("logs", nargs="+")
    p.add_argument("--out", default="marathon_curves.png")
    p.add_argument("--resume-step", type=int, default=None)
    p.add_argument("--title", default="BigGAN-Deep-3D 64^3 marathon "
                   "(production CLI, one v5e chip)")
    a = p.parse_args()

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    steps, (d_real, d_fake, g_loss, fid) = parse(a.logs)
    fig, axes = plt.subplots(3, 1, figsize=(8.5, 7.5), sharex=True,
                             facecolor="#fcfcfb")
    fig.suptitle(a.title, color=INK, fontsize=11, x=0.055, ha="left")

    def style(ax, ylab):
        ax.set_facecolor("#fcfcfb")
        ax.grid(True, color=GRID, linewidth=0.8)
        for s in ("top", "right"):
            ax.spines[s].set_visible(False)
        for s in ("left", "bottom"):
            ax.spines[s].set_color(GRID)
        ax.tick_params(colors=INK2, labelsize=8)
        ax.set_ylabel(ylab, color=INK2, fontsize=9)
        if a.resume_step is not None:
            ax.axvline(a.resume_step, color=INK2, linewidth=1,
                       linestyle=(0, (3, 3)))

    ax = axes[0]
    ax.plot(steps, d_real, color=BLUE, linewidth=1.6,
            label="E[relu(1−D(x))]  (reals)")
    ax.plot(steps, d_fake, color=ORANGE, linewidth=1.6,
            label="E[relu(1+D(G(z)))]  (fakes)")
    style(ax, "D hinge components")
    ax.legend(loc="upper right", fontsize=8, frameon=False,
              labelcolor=INK2)

    axes[1].plot(steps, g_loss, color=BLUE, linewidth=1.6)
    style(axes[1], "G loss  −E[D(G(z))]")
    if a.resume_step is not None:
        axes[1].annotate("kill + auto-resume",
                         (a.resume_step, axes[1].get_ylim()[1]),
                         textcoords="offset points", xytext=(6, -12),
                         color=INK2, fontsize=8)

    axes[2].plot(steps, fid, color=BLUE, linewidth=1.6)
    style(axes[2], "in-loop slice FID\n(random-feature stand-in)")
    axes[2].set_xlabel("training step", color=INK2, fontsize=9)

    fig.tight_layout(rect=(0, 0, 1, 0.97))
    fig.savefig(a.out, dpi=130)
    print(f"wrote {a.out}: {len(steps)} logged steps "
          f"[{steps[0]}..{steps[-1]}]")


if __name__ == "__main__":
    main()
