"""Export contract writer: checkpoint → deployable bundle + metadata.

The reference ships export_metadata.json as the integrity contract for
every deployed asset — model notes, vocab/blank ids, rerank params, and a
sha256 per file — written by its export scripts and verified at client
init (reference: web/frontend/public/export_metadata.json;
scripts/export_phoneme_onnx.py:65 writes it;
worker/inference.ts:114-117 verifies). This is the framework-side
equivalent: quantize (optionally) + serialize a checkpoint and emit the
same style of manifest for tilawa-tpu deployments.

Usage:
  python -m tilawa_tpu.train.export --checkpoint checkpoints/<run> --int4
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import time
from pathlib import Path

import jax.numpy as jnp

from tilawa_tpu.data.assets import ASSETS_DIR, EXPECTED_SHA256, sha256_file


def export_bundle(
    checkpoint: str | Path,
    out_dir: str | Path,
    int4: bool = True,
    quant: str | None = None,
) -> Path:
    """quant: explicit mode ("int4" | "int8" | None); falls back to the
    legacy int4 flag when omitted. int8 keeps streaming checkpoints
    deployable under the <200 MB constraint without the int4 accuracy
    cliff on partial-window decodes (round-3 measurement)."""
    from tilawa_tpu.train.checkpoint import load_variables, save_variables
    from tilawa_tpu.train.quantize import (
        packed_size_bytes,
        quantize_variables,
        quantized_config,
    )

    mode = quant if quant is not None else ("int4" if int4 else None)
    config, variables = load_variables(checkpoint)
    if mode and config.quant != mode:
        if config.quant:
            # Re-quantization via dequantize round trip. From int8 this is
            # quality-neutral (EXPERIMENTS.md round-3: int8 measured
            # identical to fp on streaming); from int4 the source already
            # lost precision — warn, don't refuse (a surviving int4 export
            # may be the only artifact of a deleted checkpoint).
            from tilawa_tpu.train.quantize import (
                dequantize_variables,
                dequantized_config,
            )

            if config.quant == "int4" or config.quant == "mixed":
                print(
                    f"warning: re-quantizing a {config.quant} export; "
                    "int4 source precision is already reduced"
                )
            variables = dequantize_variables(variables)
            config = dequantized_config(config)
        variables = quantize_variables(variables, mode=mode)
        config = quantized_config(config, mode=mode)

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    save_variables(out, config, variables)

    cfg_dict = dataclasses.asdict(config)
    cfg_dict["dtype"] = jnp.dtype(config.dtype).name

    files = {}
    for name in ("config.json", "variables.msgpack"):
        p = out / name
        files[name] = {"bytes": p.stat().st_size, "sha256": sha256_file(p)}
    # shared data assets ride along in the contract (same digests the
    # reference publishes for tokenizer/vocab)
    for name in ("tokenizer.model", "vocab.json"):
        p = ASSETS_DIR / name
        if p.exists():
            files[name] = {
                "bytes": p.stat().st_size,
                "sha256": sha256_file(p),
                "expected_sha256": EXPECTED_SHA256.get(name),
            }

    metadata = {
        "framework": "tilawa-tpu",
        "exported_at": time.strftime("%Y-%m-%d %H:%M:%S"),
        "model_notes": {
            "input": "audio_signal [B, N] float32 16 kHz + length int32 "
                     "(in-graph mel frontend)",
            "output": f"log_probs [B, T, {config.num_classes}] float32",
            "quant": config.quant or "none",
        },
        "vocab_tokens": config.num_classes,
        "blank_id": config.blank_id,
        "rerank": {"span_penalty": 0.5, "min_frames": "2L+1 <= T"},
        "config": cfg_dict,
        "param_bytes": packed_size_bytes(variables["params"]),
        "files": files,
    }
    (out / "export_metadata.json").write_text(
        json.dumps(metadata, indent=2), encoding="utf-8"
    )
    return out


def verify_bundle(bundle_dir: str | Path) -> dict[str, bool]:
    """Re-hash every file named in the manifest (client-init verification,
    inference.ts:114-117 equivalent)."""
    bundle = Path(bundle_dir)
    meta = json.loads((bundle / "export_metadata.json").read_text())
    out = {}
    for name, info in meta["files"].items():
        p = bundle / name if (bundle / name).exists() else ASSETS_DIR / name
        out[name] = p.exists() and sha256_file(p) == info["sha256"]
    return out


def main(argv=None):
    parser = argparse.ArgumentParser(description="export a deployable bundle")
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--out", default=None)
    parser.add_argument("--int4", action="store_true", default=True)
    parser.add_argument("--fp", dest="int4", action="store_false")
    parser.add_argument("--quant", default=None,
                        choices=["int4", "int8", "mixed"],
                        help="explicit quantization mode (overrides --int4/--fp)")
    parser.add_argument("--verify", action="store_true",
                        help="verify an existing bundle instead of exporting")
    args = parser.parse_args(argv)
    if args.verify:
        results = verify_bundle(args.checkpoint)
        print(json.dumps(results, indent=2))
        return 0 if all(results.values()) else 1
    out = args.out or (str(args.checkpoint).rstrip("/") + "_export")
    bundle = export_bundle(args.checkpoint, out, int4=args.int4, quant=args.quant)
    print(f"exported to {bundle}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
