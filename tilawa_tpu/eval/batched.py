"""Whole-corpus batched evaluation: the TPU-native throughput path.

The reference evaluates clip-by-clip (benchmark/runner.py:297-343); on a
TPU the batch axis is free parallelism (SURVEY.md §2.9), so this module
groups clips into audio-length buckets, runs each bucket as ONE batched
encoder dispatch, and runs the host-side decision stack off the shared
device-resident log-probs. The audio-sec/sec/chip number in bench.py
comes from here.
"""

from __future__ import annotations

import time
from collections import defaultdict

import numpy as np

from tilawa_tpu.pipeline.runtime import bucket_length


def batched_corpus_eval(
    recognizer,
    audios: list[tuple[str, np.ndarray, list[dict]]],
    batch_size: int = 8,
) -> dict:
    """audios: (sample_id, waveform, expected_verses) triples.

    Returns per-sample predictions plus throughput metrics. The encoder
    runs bucket-batched; decode/retrieval/rerank run per clip on the
    device-resident log-probs (rerank dispatches still batch internally).
    """
    from tilawa_tpu.eval.metrics import predict_to_emissions, score_sequence
    from tilawa_tpu.pipeline.runtime import LONG_THRESHOLD

    runtime = recognizer.runtime
    groups: dict[int, list[int]] = defaultdict(list)
    long_idxs: list[int] = []
    use_chunking = getattr(runtime, "long_chunking", False)
    for i, (_sid, audio, _exp) in enumerate(audios):
        if use_chunking and len(audio) > LONG_THRESHOLD:
            # Crop-trained models: long clips take the chunked stitched
            # forward — itself a [K, LONG_CHUNK] batched dispatch.
            long_idxs.append(i)
        else:
            groups[bucket_length(len(audio))].append(i)

    # Warmup: compile one program per bucket before the timed pass (the
    # reference excludes warmup too, benchmark/runner.py:271-280). Short
    # chunks are padded up to batch_size so every dispatch in a bucket
    # reuses the same program.
    # Every dispatch (main pass AND the TTA variant pass, whose group
    # sizes aren't known yet) pads to batch_size: exactly ONE compiled
    # program per bucket. Unpadded variant batches compiled fresh [B,
    # bucket] programs INSIDE the timed pass and cratered the throughput
    # number (58.5 -> 14 audio-s/s when batched TTA landed).
    tta_buckets: set[int] = set()
    if getattr(recognizer, "tta", False):
        for _sid, a, _exp in audios:
            if len(a) <= LONG_THRESHOLD:
                # 0.9x lengthens audio — a variant can cross into a bucket
                # the main pass never uses
                tta_buckets.add(bucket_length(int(len(a) / 0.9) + 1))
    for bucket in sorted(set(groups) | tta_buckets):
        runtime.forward_batch([np.zeros(bucket, np.float32)] * batch_size)
    for i in long_idxs:
        k = runtime.chunk_count(len(audios[i][1]))
        if k not in runtime._long_programs:
            runtime.forward_long(np.zeros(len(audios[i][1]), np.float32))

    predictions: dict[int, dict] = {}
    total_audio_s = 0.0
    t0 = time.perf_counter()
    # Phase 1: QUEUE every bucket's forward without synchronizing — XLA
    # dispatch is async, so the tunnel round trip is paid once for the
    # whole queue instead of once per dispatch (forward_batch_async).
    inflight: list[tuple[list[int], object, object]] = []
    for bucket, idxs in sorted(groups.items()):
        for pos in range(0, len(idxs), batch_size):
            chunk = idxs[pos:pos + batch_size]
            waves = [audios[i][1] for i in chunk]
            while len(waves) < batch_size:  # one program per bucket
                waves.append(np.zeros(bucket, np.float32))
            lp_dev, packed_dev = runtime.forward_batch_async(waves)
            inflight.append((chunk, lp_dev, packed_dev))
    # Device execution is FIFO: syncing the LAST queued batch bounds the
    # wall time of the WHOLE forward queue — that is the honest
    # forward_s under pipelining.
    if inflight:
        np.asarray(inflight[-1][2])
    forward_s = time.perf_counter() - t0
    # Phase 2: host-side decision stack per clip (data already computed).
    for chunk, lp_dev, packed_dev in inflight:
        packed = np.asarray(packed_dev)
        t_valids, ids_b = packed[:, 0], packed[:, 1:]
        for j, i in enumerate(chunk):
            t_valid = int(t_valids[j])
            transcript = recognizer.decode_ids(ids_b[j, :t_valid])
            predictions[i] = recognizer._predict_from_logprobs(
                lp_dev[j], t_valid, transcript
            )
            total_audio_s += len(audios[i][1]) / 16000.0
    for i in long_idxs:
        tf = time.perf_counter()
        lp, ids, t_valid = runtime.forward_long(audios[i][1])
        forward_s += time.perf_counter() - tf
        predictions[i] = recognizer._predict_from_logprobs(
            lp, t_valid, recognizer.decode_ids(ids)
        )
        total_audio_s += len(audios[i][1]) / 16000.0

    # ---- TTA pass (reference: c2c-direct-mixed-tta/run.py): low-confidence
    # clips re-run at 0.9x/1.1x. The per-clip path pays one [2, bucket]
    # dispatch per hard clip; here ALL hard clips' variants batch together
    # per bucket, so the TTA-inclusive throughput stays a batched number
    # (VERDICT r3 weak #2 — headline throughput and headline accuracy must
    # come from the same path).
    n_tta = 0
    if getattr(recognizer, "tta", False):
        from tilawa_tpu.data.audio import speed_perturb
        from tilawa_tpu.pipeline.predict import TTA_FACTORS, TTA_SKIP_THRESHOLD

        hard = [
            i for i in range(len(audios))
            if predictions[i]["score"] < TTA_SKIP_THRESHOLD
        ]
        n_tta = len(hard)
        variants: list[tuple[int, np.ndarray]] = []
        for i in hard:
            for f in TTA_FACTORS:
                variants.append((i, speed_perturb(audios[i][1], f)))
        vpred: dict[int, dict] = {}
        vgroups: dict[int, list[int]] = defaultdict(list)
        vlong: list[int] = []
        for vi, (_i, w) in enumerate(variants):
            if len(w) > LONG_THRESHOLD:
                vlong.append(vi)
            else:
                vgroups[bucket_length(len(w))].append(vi)
        vinflight: list[tuple[list[int], object, object]] = []
        tf = time.perf_counter()
        for bucket, vidxs in sorted(vgroups.items()):
            for pos in range(0, len(vidxs), batch_size):
                chunk = vidxs[pos:pos + batch_size]
                waves = [variants[vi][1] for vi in chunk]
                while len(waves) < batch_size:  # reuse the bucket program
                    waves.append(np.zeros(bucket, np.float32))
                vinflight.append(
                    (chunk, *runtime.forward_batch_async(waves))
                )
        if vinflight:
            np.asarray(vinflight[-1][2])
        forward_s += time.perf_counter() - tf
        for chunk, lp_dev, packed_dev in vinflight:
            packed = np.asarray(packed_dev)
            t_valids, ids_b = packed[:, 0], packed[:, 1:]
            for j, vi in enumerate(chunk):
                tv = int(t_valids[j])
                vpred[vi] = recognizer._predict_from_logprobs(
                    lp_dev[j], tv, recognizer.decode_ids(ids_b[j, :tv])
                )
        for vi in vlong:
            tf = time.perf_counter()
            lp, ids, tv = runtime.forward(variants[vi][1])
            forward_s += time.perf_counter() - tf
            vpred[vi] = recognizer._predict_from_logprobs(
                lp, tv, recognizer.decode_ids(ids)
            )
        for pos, i in enumerate(hard):
            p09, p11 = vpred[2 * pos], vpred[2 * pos + 1]
            predictions[i] = recognizer.tta_vote([p09, predictions[i], p11])
    wall = time.perf_counter() - t0

    scores = {"recall": 0.0, "precision": 0.0, "sequence_accuracy": 0.0}
    n = len(audios)
    for i, (_sid, _audio, expected) in enumerate(audios):
        s = score_sequence(expected, predict_to_emissions(predictions[i]))
        for k in scores:
            scores[k] += s[k]

    return {
        "n": n,
        "n_tta": n_tta,
        "wall_s": round(wall, 3),
        "forward_s": round(forward_s, 3),
        "audio_s": round(total_audio_s, 1),
        "audio_sec_per_sec": round(total_audio_s / wall, 2) if wall else None,
        "recall": round(scores["recall"] / n, 4) if n else None,
        "precision": round(scores["precision"] / n, 4) if n else None,
        "seq_acc": round(scores["sequence_accuracy"] / n, 4) if n else None,
        "predictions": {audios[i][0]: predictions[i] for i in range(n)},
    }
