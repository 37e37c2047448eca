"""Train + freeze the OCR glyph-accuracy judge (reptext_tpu/eval/ocr.py).

Produces benchmarks/ocr_judge.npz (committed) and prints the separation
evidence the metric needs (VERDICT r2 #2): character accuracy ~1 on perfect
renders, ~0 on noise — the discrimination the edge-IoU proxy lacks.

Usage:
    python benchmarks/train_ocr_judge.py [--steps 3000] [--eval-only]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

WEIGHTS = Path(__file__).resolve().parent / "ocr_judge.npz"
REPORT = Path(__file__).resolve().parent / "ocr_judge_eval.json"


def evaluate(params) -> dict:
    """Separation evidence on held-out words: perfect, augmented, noise."""
    from reptext_tpu.eval import ocr

    rng = np.random.default_rng(123)
    words = [ocr.random_word(rng) for _ in range(64)]
    perfect = [ocr.render_word(w, font_size=int(rng.integers(24, 56)))
               for w in words]
    augmented = [ocr._augment(img, rng) for img in perfect]
    noise = [rng.random((40, 100)).astype(np.float32) for _ in words]
    # fixed demo words (the data.py pools / reference demo strings),
    # including mixed-case Latin (labels case-fold; lowercase shapes must score)
    demo = ["مرحبا", "سلام", "OPEN", "CAFE", "2026", "مطعم", "Hello", "Cafe"]
    demo_imgs = [ocr.render_word(w, font_size=40) for w in demo]
    return {
        "char_accuracy_perfect": round(ocr.char_accuracy(perfect, words, params), 4),
        "char_accuracy_augmented": round(ocr.char_accuracy(augmented, words, params), 4),
        "char_accuracy_noise_floor": round(ocr.char_accuracy(noise, words, params), 4),
        "char_accuracy_demo_words": round(ocr.char_accuracy(demo_imgs, demo, params), 4),
        "n_eval_words": len(words),
    }


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=3000)
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--eval-only", action="store_true")
    args = parser.parse_args(argv)

    import jax

    # training is host-render-bound and the judge must be runnable without
    # the TPU tunnel; set BEFORE any backend probe (jax.default_backend()
    # would initialize the tunnel backend just to ask its name)
    jax.config.update("jax_platforms", "cpu")

    from reptext_tpu.eval import ocr

    if args.eval_only:
        params = ocr.load_judge(str(WEIGHTS))
    else:
        t0 = time.time()
        params = ocr.train_judge(steps=args.steps, batch_size=args.batch_size)
        print(f"trained {args.steps} steps in {time.time() - t0:.0f}s")
        ocr.save_judge(params, str(WEIGHTS))
        print(f"wrote {WEIGHTS}")

    report = evaluate(params)
    print(json.dumps(report, indent=1))
    REPORT.write_text(json.dumps(report, indent=1))
    print(f"wrote {REPORT}")
    # the judge is only a judge if it separates: hard gates
    assert report["char_accuracy_perfect"] > 0.9, report
    assert report["char_accuracy_noise_floor"] < 0.1, report
    return 0


if __name__ == "__main__":
    sys.exit(main())
