"""A/B the adaptive (TeaCache-family) velocity-cache trigger on real hardware.

Times the REAL fused sampler (bench.build_sampler — lax.scan, CN gating,
regional masking, Euler) at reduced depth / 1024² / 30 steps in four modes:

  uncached        interval=1 (the headline configuration)
  fixed           interval=2, warmup=8 → 20/30 computed steps
                  (8 warmup + every 2nd of steps 8..29 + final)
  adaptive-0      adaptive, threshold=0 → trigger fires every step: every
                  step computes. Isolates the TRIGGER OVERHEAD (per-step
                  scalar L1 reduction + lax.cond wrapper) vs uncached.
  adaptive-skip   adaptive, threshold=∞, max_skip=2 → drift never fires, so
                  the cadence is deterministic: 8 warmup + every 3rd step +
                  final = 16/30 computed. Isolates the SKIP MECHANICS
                  speedup at a known compute count (random weights make a
                  real drift trace meaningless — fidelity-side behavior is
                  pinned by tests/test_velocity_cache.py against a Python
                  reference loop, and must be re-measured on real weights).

Prints one JSON line with per-mode ms/step, speedups, and the
computed-step accounting. Reference: no analogue (acceleration beyond the
reference's per-step roofline; RepText/infer.py runs every step).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import DEPTHS, build_sampler, timeit  # noqa: E402

STEPS = 30
WARMUP = 8


def _adaptive_skip_computed(steps: int, warmup: int, max_skip: int) -> int:
    """Computed-step count when the drift trigger never fires (threshold=∞):
    warmup, then a compute forced every (max_skip+1)th step, plus the final."""
    computed, skips = 0, 0
    for i in range(steps):
        run = i < warmup or i >= steps - 1 or skips >= max_skip
        if run:
            computed, skips = computed + 1, 0
        else:
            skips += 1
    return computed


def main() -> None:
    depth = DEPTHS[0]
    modes = {
        "uncached": dict(),
        "fixed_i2": dict(vc_interval=2, vc_warmup=WARMUP),
        "adaptive_t0": dict(vc_mode="adaptive", vc_threshold=0.0,
                            vc_warmup=WARMUP),
        "adaptive_skip": dict(vc_mode="adaptive", vc_threshold=1e9,
                              vc_max_skip=2, vc_warmup=WARMUP),
    }
    computed = {
        "uncached": STEPS,
        "fixed_i2": WARMUP + len(range(WARMUP, STEPS, 2)) + 1,  # final forced
        "adaptive_t0": STEPS,
        "adaptive_skip": _adaptive_skip_computed(STEPS, WARMUP, 2),
    }
    times = {}
    for name, kw in modes.items():
        fn, p, lat = build_sampler(*depth, STEPS, **kw)
        times[name] = timeit(fn, p, lat, iters=2, chain=False)
        print(f"{name}: {times[name] / STEPS * 1e3:.1f} ms/step "
              f"({computed[name]}/{STEPS} computed)", file=sys.stderr)
        del fn, p, lat

    base = times["uncached"]
    result = {
        "metric": "adaptive_cache_ab",
        "depth": list(depth),
        "steps": STEPS,
        "ms_per_step": {k: round(v / STEPS * 1e3, 2) for k, v in times.items()},
        "computed_steps": computed,
        "trigger_overhead_pct": round(
            (times["adaptive_t0"] / base - 1.0) * 100, 2),
        "speedup_fixed_i2": round(base / times["fixed_i2"], 3),
        "ideal_fixed_i2": round(STEPS / computed["fixed_i2"], 3),
        "speedup_adaptive_skip": round(base / times["adaptive_skip"], 3),
        "ideal_adaptive_skip": round(STEPS / computed["adaptive_skip"], 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
