"""Compare alpha curves across noise-schedule variants.

Rebuild of the reference scheduler's __main__ smoke block
(src/training/scheduler.py:153-202): plots sqrt(alpha_bar_t) for the base
schedule, plain SNR shift, interpolated shift, and a Kolors-style longer
schedule. Writes check_alpha.png (matplotlib optional: falls back to CSV).
"""

from __future__ import annotations

import argparse
import csv

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--output", default="check_alpha.png")
    p.add_argument("--shift-scale", type=float, default=8.0)
    args = p.parse_args(argv)

    import jax.numpy as jnp

    from mvd_tpu.diffusion import NoiseSchedule, make_shifted_schedule

    base = NoiseSchedule.create()
    shift = make_shifted_schedule(base, args.shift_scale, "default")
    interp = make_shifted_schedule(base, args.shift_scale, "interpolated")
    kolors = NoiseSchedule.create(num_train_timesteps=1100, beta_end=0.014)

    t = np.arange(1000)
    curves = {
        "base": np.sqrt(np.asarray(base.alphas_cumprod)),
        f"shift({args.shift_scale})": np.sqrt(np.asarray(shift.alphas_cumprod)),
        f"interpolated({args.shift_scale})": np.sqrt(np.asarray(interp.alphas_cumprod)),
        "kolors": np.sqrt(np.asarray(kolors.alphas_cumprod))[:1000],
    }
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        for name, c in curves.items():
            plt.plot(t, c[: len(t)], label=name)
        plt.xlabel("t")
        plt.ylabel("sqrt(alpha_bar)")
        plt.legend()
        plt.grid()
        plt.savefig(args.output)
        print(f"wrote {args.output}")
    except ImportError:
        csv_path = args.output.rsplit(".", 1)[0] + ".csv"
        with open(csv_path, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["t"] + list(curves))
            for i in t:
                w.writerow([i] + [float(curves[k][i]) for k in curves])
        print(f"matplotlib unavailable; wrote {csv_path}")


if __name__ == "__main__":
    main()
