"""Console entry points.

`tilawa-recognize <audio...>` — the working equivalent of the reference's
declared-but-missing `recognize` console script (reference:
pyproject.toml:26-28 points at modules that don't exist; SURVEY.md §1).
"""

from __future__ import annotations

import argparse
import json
import sys


def recognize_main(argv=None):
    parser = argparse.ArgumentParser(
        description="Recognize Quran verses in audio files (surah:ayah out)"
    )
    parser.add_argument("audio", nargs="+", help="16 kHz-ish wav files")
    parser.add_argument("--no-tta", action="store_true")
    parser.add_argument("--transcript", action="store_true",
                        help="also print the raw transcript")
    args = parser.parse_args(argv)

    from tilawa_tpu.eval.experiments import _load_runtime
    from tilawa_tpu.pipeline.predict import Recognizer

    recognizer = Recognizer(_load_runtime(), tta=not args.no_tta)
    status = 0
    for path in args.audio:
        try:
            result = recognizer.predict(path)
        except Exception as e:  # noqa: BLE001
            print(f"{path}: ERROR {e}", file=sys.stderr)
            status = 1
            continue
        out = {
            "file": path,
            "surah": result["surah"],
            "ayah": result["ayah"],
            "ayah_end": result["ayah_end"],
            "score": result["score"],
        }
        if args.transcript:
            out["transcript"] = result.get("transcript", "")
        print(json.dumps(out, ensure_ascii=False))
    return status


if __name__ == "__main__":
    sys.exit(recognize_main())
