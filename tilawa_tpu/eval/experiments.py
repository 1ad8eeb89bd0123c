"""Experiment registry (reference: benchmark/runner.py:29-86 registry +
LAB_AUTO_DISCOVER). Experiments are lazy factories returning pipeline
objects with predict()/transcribe().

Registered families:
  c2c-direct-mixed      — champion pipeline on the FastConformer TPU runtime
  c2c-direct-mixed-tta  — + confidence-gated batched 0.9x/1.1x TTA
  oracle / oracle-hard  — champion decision stack driven by synthetic
                          log-probs rendered from ground truth (validates
                          decode → retrieve → rerank end to end while the
                          reference's trained weights remain unavailable;
                          SURVEY.md §2.2 asset note)
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import numpy as np

_REGISTRY: dict[str, callable] = {}
_CACHE: dict[str, object] = {}


def register(name: str):
    def deco(fn):
        _REGISTRY[name] = fn
        return fn
    return deco


def list_experiments() -> list[str]:
    return sorted(_REGISTRY)


def get_experiment(name: str):
    if name not in _CACHE:
        if name not in _REGISTRY:
            raise KeyError(f"unknown experiment {name!r}; have {list_experiments()}")
        _CACHE[name] = _REGISTRY[name]()
    return _CACHE[name]


def _load_runtime(quant: str | None = None):
    """FastConformer runtime with trained weights when a checkpoint exists,
    random init otherwise (latency/throughput numbers are weight-agnostic).
    quant="int4" loads/derives packed weights (the reference's "mixed"
    88 MB export; c2c-direct-mixed/run.py:37-52)."""
    import dataclasses

    from tilawa_tpu.models.fastconformer import FastConformerConfig
    from tilawa_tpu.pipeline.runtime import EncoderRuntime
    from tilawa_tpu.train.checkpoint import load_variables, shipped_checkpoint

    long_chunking = os.getenv("TILAWA_LONG_CHUNKING", "") not in (
        "", "0", "false"
    )
    ckpt = shipped_checkpoint()
    if ckpt:
        config, variables = load_variables(ckpt)
        if quant and config.quant != quant:
            from tilawa_tpu.train.quantize import quantize_variables, quantized_config

            variables = quantize_variables(variables)
            config = quantized_config(config)
        return EncoderRuntime(config, variables, long_chunking=long_chunking)
    config = FastConformerConfig.large()
    if quant:
        config = dataclasses.replace(config, quant=quant)
    return EncoderRuntime(config, long_chunking=long_chunking)


def _make_recognizer(
    tta: bool, quant: str | None = "int4", rerank_mode: str = "gated"
):
    from tilawa_tpu.pipeline.predict import Recognizer

    return Recognizer(
        _load_runtime(quant=quant), tta=tta, rerank_mode=rerank_mode
    )


@register("c2c-direct")
def _c2c_direct():
    """Full-precision reference algorithm (reference: c2c-direct/run.py)."""
    return _make_recognizer(tta=False, quant=None)


@register("c2c-direct-tta")
def _c2c_direct_tta():
    """TTA on the checkpoint's NATIVE quantization (int8 streaming bundles
    stay int8 — the mixed experiments repack to int4, which the Int8Dense
    layout doesn't support)."""
    return _make_recognizer(tta=True, quant=None)


@register("c2c-direct-mixed")
def _c2c_direct_mixed():
    return _make_recognizer(tta=False)


@register("c2c-direct-mixed-tta")
def _c2c_direct_mixed_tta():
    return _make_recognizer(tta=True)


@register("fastconformer-zeroshot")
def _fastconformer_zeroshot():
    """Greedy decode + text match_verse only, no CTC rerank (reference:
    experiments/nvidia-fastconformer/run.py:167-236 zero-shot baseline)."""
    return _make_recognizer(tta=False, rerank_mode="never")


@register("ctc-alignment")
def _ctc_alignment():
    """Forced-alignment rerank of every candidate, gate disabled (reference:
    experiments/ctc-alignment/run.py + ctc_scorer.py:14-98 — candidates are
    always CTC-scored against the model's own log-probs)."""
    return _make_recognizer(tta=False, rerank_mode="always")


_REFS_BY_FILE: dict[str, list[tuple[int, int, int | None]]] = {}


def manifest_refs_for(path: str) -> list[tuple[int, int, int | None]]:
    """Ground-truth verse refs for a corpus audio file (any corpus),
    resolved from the manifests; used by oracle-acoustics experiments."""
    fname = Path(path).name
    if not _REFS_BY_FILE:
        from tilawa_tpu.eval.runner import CORPUS_DIRS

        for key in ("v1", "v2", "v3"):
            mpath = CORPUS_DIRS[key] / "manifest.json"
            if not mpath.exists():
                continue
            with open(mpath, encoding="utf-8") as f:
                data = json.load(f)
            for s in data["samples"] if isinstance(data, dict) else data:
                refs = [
                    (e["surah"], e["ayah"], None)
                    for e in s.get(
                        "expected_verses",
                        [{"surah": s["surah"], "ayah": s["ayah"]}],
                    )
                ]
                _REFS_BY_FILE.setdefault(s["file"], refs)
    if fname not in _REFS_BY_FILE:
        raise KeyError(f"no manifest entry for {fname}")
    return _REFS_BY_FILE[fname]


class OracleExperiment:
    """Champion decision stack over synthetic acoustics.

    predict(path) resolves the sample's ground-truth refs from the corpus
    manifest, renders CTC log-probs with the configured corruption level,
    and runs the full text+rerank pipeline. Audio files are never decoded;
    only their manifest entries matter.
    """

    acoustics = "oracle"  # simulation marker, carried into results rows

    def __init__(self, error_rate: float = 0.0, noise: float = 0.3, seed: int = 0):
        from tilawa_tpu.data.quran import QuranDB
        from tilawa_tpu.data.token_store import TokenStore
        from tilawa_tpu.data.assets import BLANK_ID
        from tilawa_tpu.pipeline.predict import Recognizer
        from tilawa_tpu.pipeline.runtime import OracleRuntime

        self.db = QuranDB()
        self.token_store = TokenStore.load_default()

        def lookup(surah, ayah, ayah_end):
            ids = self.token_store.ids_for_key(surah, ayah, ayah_end)
            if ids is None:
                text = self.db.span_text(surah, ayah, ayah_end or ayah)
                ids = self.token_store.ids_for_text(text) if text else []
            return ids

        class _RT(OracleRuntime):
            def log_probs(self, audio):  # pragma: no cover - oracle never decodes
                raise NotImplementedError

        self.runtime = _RT(
            lookup, blank_id=BLANK_ID, noise=noise, error_rate=error_rate, seed=seed
        )
        self.recognizer = Recognizer(
            self.runtime, db=self.db, token_store=self.token_store
        )
        self._refs_by_file: dict[str, list[tuple[int, int, int | None]]] = {}

    def _manifest_refs(self, path: str) -> list[tuple[int, int, int | None]]:
        fname = Path(path).name
        if not self._refs_by_file:
            for key in ("v1", "v2", "v3"):
                from tilawa_tpu.eval.runner import CORPUS_DIRS

                mpath = CORPUS_DIRS[key] / "manifest.json"
                if not mpath.exists():
                    continue
                with open(mpath, encoding="utf-8") as f:
                    data = json.load(f)
                for s in data["samples"] if isinstance(data, dict) else data:
                    refs = [
                        (e["surah"], e["ayah"], None)
                        for e in s.get(
                            "expected_verses",
                            [{"surah": s["surah"], "ayah": s["ayah"]}],
                        )
                    ]
                    self._refs_by_file.setdefault(s["file"], refs)
        if fname not in self._refs_by_file:
            raise KeyError(f"no manifest entry for {fname}")
        return self._refs_by_file[fname]

    def predict(self, path: str) -> dict:
        refs = self._manifest_refs(path)
        lp, t = self.runtime.render(refs)
        return self.recognizer._predict_from_logprobs(lp, t)

    def transcribe(self, path: str) -> str:
        refs = self._manifest_refs(path)
        lp, t = self.runtime.render(refs)
        return self.recognizer.greedy_decode(lp, t)

    def model_size(self) -> int:
        return 0


class LMFusionExperiment(OracleExperiment):
    """Champion stack + n-gram shallow-fusion rescoring of the candidate
    list (reference: experiments/fastconformer-quran-lm-fusion/run.py —
    KenLM alpha 0.7 / beta 1.0; our LM is text/ngram.py over the same
    corpus asset). Acoustics follow the weights: with a shipped champion
    checkpoint the base predictions come from the REAL model (the
    reference's fusion runs over the real FastConformer too), falling
    back to the synthetic-oracle stack only when no weights exist."""

    def __init__(self, alpha: float = 0.7, beta: float = 1.0, **kw):
        super().__init__(**kw)
        from tilawa_tpu.text.ngram import NGramLM

        self.lm = NGramLM.from_corpus_file(order=5)
        self.alpha, self.beta = alpha, beta
        from tilawa_tpu.train.checkpoint import shipped_checkpoint

        self._real = None
        if shipped_checkpoint() is not None:
            self._real = _make_recognizer(tta=False)
            self.acoustics = "real"

    def _base_predict(self, path: str) -> dict:
        if self._real is not None:
            return self._real.predict(path)
        return super().predict(path)

    def transcribe(self, path: str) -> str:
        if self._real is not None:
            return self._real.transcribe(path)
        return super().transcribe(path)

    def model_size(self) -> int:
        if self._real is not None:
            return self._real.model_size()
        return 0

    def predict(self, path: str) -> dict:
        from tilawa_tpu.text.ngram import lm_rescore

        result = self._base_predict(path)
        cands = result.get("candidates") or []
        if len(cands) > 1:
            texts = []
            for c in cands:
                span = self.db.span_text(
                    c["surah"], c["ayah"], c.get("ayah_end") or c["ayah"]
                )
                texts.append({**c, "text": span or "", "score": c["score"]})
            fused = lm_rescore(texts, self.lm, self.alpha, self.beta)
            best = fused[0]
            result = {
                **result,
                "surah": best["surah"],
                "ayah": best["ayah"],
                "ayah_end": best.get("ayah_end") or best["ayah"],
                "candidates": fused[:5],
            }
        return result


def _phoneme_checkpoint() -> Path | None:
    env = os.getenv("TILAWA_PHONEME_CKPT")
    if env:
        return Path(env)
    # Shipped phoneme bundle first (the committed artifact — training
    # checkpoints are transient); newest training step as the dev path.
    shipped = Path("exports/phoneme-int8")
    if (shipped / "variables.msgpack").exists():
        return shipped
    steps = sorted(Path("checkpoints/phoneme").glob("step_*"))
    return steps[-1] if steps else None


class PhonemeExperiment:
    """Phoneme pipeline (reference: experiments/fastconformer-phoneme/
    run.py — 69-token CTC head + mispronunciation detection). Runs on the
    trained phoneme head when checkpoints/phoneme exists
    (tilawa_tpu.train.phoneme), else on synthetic phoneme acoustics with
    an explicit acoustics='oracle' marker in every results row."""

    def __init__(self):
        from tilawa_tpu.pipeline.phoneme import PhonemeOracleRuntime, PhonemePipeline

        ckpt = _phoneme_checkpoint()
        if ckpt is not None:
            from tilawa_tpu.data.phonemes import PhonemeStore
            from tilawa_tpu.pipeline.runtime import EncoderRuntime
            from tilawa_tpu.train.checkpoint import load_variables

            config, variables = load_variables(ckpt)
            self.runtime = EncoderRuntime(config, variables)
            self.store = PhonemeStore.load_default()
            self.acoustics = "real"
        else:
            self.runtime = PhonemeOracleRuntime(noise=0.3)
            self.store = self.runtime.store
            self.acoustics = "oracle"
        self.pipeline = PhonemePipeline(self.runtime, store=self.store)

    def transcribe(self, path: str) -> str:
        if self.acoustics == "oracle":
            raise NotImplementedError(
                "phoneme transcribe requires trained weights or oracle refs"
            )
        return self.pipeline.transcribe_phonemes(path)

    def _peel_sequence(
        self, phonemes: str, max_verses: int = 12
    ) -> list[tuple[int, int, float]]:
        """Multi-verse phoneme decoding: repeatedly match the HEAD of the
        remaining phoneme string against verse reference strings (with a
        continuation bonus), emit, and trim the matched prefix — the
        phoneme-space analogue of the full-transcript peel-off loop
        (reference: shared/streaming.py:57-99; w2v-phonemes chunking +
        voting, experiments/w2v-phonemes/run.py:234-293). A single whole-
        verse clip degenerates to one iteration."""
        from tilawa_tpu.text.levenshtein import ratio

        # Every surah's verse-1 ref embeds the bismillah; a recited
        # bismillah otherwise matches 1:1 (whose ref IS the bismillah)
        # and the stripped remainder then misses (s,1) refs that still
        # carry the prefix. Score both variants.
        bsm = self.store.refs.get((1, 1), "")

        def variants(s: int, a: int, ref: str) -> list[str]:
            if a == 1 and bsm and ref.startswith(bsm) and len(ref) > len(bsm):
                return [ref, ref[len(bsm):].strip(" |")]
            return [ref]

        out: list[tuple[int, int, float]] = []
        remaining = phonemes.strip()
        hint: tuple[int, int] | None = None
        pending_bsm = False
        while len(remaining.split()) >= 4 and len(out) < max_verses:
            # Candidates from the full remainder AND a head window: the
            # full-string ratio buries short verse-1 refs under a long
            # multi-verse tail (36:1 ranked nowhere for a 5-verse string).
            pool = {
                (c["surah"], c["ayah"])
                for c in self.store.match_verse(remaining, top_k=40)
            }
            if len(remaining) > 120:
                pool |= {
                    (c["surah"], c["ayah"])
                    for c in self.store.match_verse(
                        remaining[:120], top_k=40
                    )
                }
                pool |= {
                    (c["surah"], c["ayah"])
                    for c in self.store.match_verse(remaining[:60], top_k=20)
                }
            if hint and (hint[0], hint[1] + 1) in self.store.refs:
                pool.add((hint[0], hint[1] + 1))
            # Rarity 5-gram surah voting widens the pool with verses the
            # edit-ratio scan buries under length mismatch (reference:
            # w2v-phonemes/run.py:234-293 — ngram surahs union the
            # Levenshtein surahs before the span pass).
            for v in self.store.ngram_vote(remaining[:160]):
                for a in range(v["ayah"], min(v["ayah_end"], v["ayah"] + 7) + 1):
                    if (v["surah"], a) in self.store.refs:
                        pool.add((v["surah"], a))
            best = None
            for (s, a) in pool:
                base_ref = self.store.refs.get((s, a)) or ""
                if not base_ref:
                    continue
                for ref in variants(s, a, base_ref):
                    pr = ratio(remaining[: len(ref) + 8], ref)
                    bonus = (
                        0.15 if hint and (s, a) == (hint[0], hint[1] + 1)
                        else 0.0
                    )
                    if best is None or pr + bonus > best[0]:
                        best = (pr + bonus, pr, s, a, ref)
            if best is None or best[1] < 0.45:
                break
            _, pr, s, a, ref = best
            if (s, a) == (1, 1) and not hint:
                # A leading pure-bismillah read may be surah preamble, not
                # Fatiha: hold it; emit only if surah 1 actually continues.
                pending_bsm = True
            else:
                if pending_bsm:
                    if (s, a) == (1, 2):
                        out.append((1, 1, pr))
                    pending_bsm = False
                out.append((s, a, pr))
            lo = max(1, int(len(ref) * 0.6))
            hi = min(len(remaining), int(len(ref) * 1.4) + 4)
            cut, cbest = min(hi, len(remaining)), -1.0
            step = max(1, (hi - lo) // 24)
            for c in range(lo, hi + 1, step):
                r = ratio(remaining[:c], ref)
                if r > cbest:
                    cbest, cut = r, c
            remaining = remaining[cut:].strip()
            hint = (s, a)
        if pending_bsm and not out:
            out.append((1, 1, 0.5))
        return out

    def _ctc_rerank_phonemes(
        self, lp, t_valid: int, phonemes: str,
        seq: list[tuple[int, int, float]],
    ) -> dict | None:
        """Forced-alignment rerank of verse/span candidates against the
        phoneme log-probs — the champion's decisive stage (reference:
        c2c-direct/run.py:314-380) applied in phoneme space. The fuzzy
        string match alone inherits every decode error; the CTC lattice
        scores candidates against the model's own evidence instead."""
        from tilawa_tpu.pipeline.rerank import SPAN_PENALTY, score_token_lists

        cands: list[tuple[int, int, int | None]] = []
        seen: set[tuple] = set()

        def add(s: int, a: int, a_end: int | None) -> None:
            if a_end is not None and a_end <= a:
                a_end = None
            key = (s, a, a_end)
            if key in seen or (s, a) not in self.store.refs:
                return
            if a_end is not None and (s, a_end) not in self.store.refs:
                return
            seen.add(key)
            cands.append(key)

        singles = self.store.match_verse(phonemes, top_k=12)
        for c in singles:
            add(c["surah"], c["ayah"], None)
        for v in self.store.ngram_vote(phonemes):
            a_end = min(v["ayah_end"], v["ayah"] + 7)
            add(v["surah"], v["ayah"], a_end if a_end > v["ayah"] else None)
            add(v["surah"], v["ayah"], None)
        if seq:
            s0, a0, _ = seq[0]
            add(s0, a0, None)
            ayahs = [a for s, a, _sc in seq if s == s0]
            if ayahs == list(range(a0, a0 + len(seq))) and len(seq) > 1:
                add(s0, a0, ayahs[-1])
        # span enumeration around the single-verse leaders
        for c in singles[:4]:
            for k in range(1, 6):
                add(c["surah"], c["ayah"], c["ayah"] + k)
            for back in range(1, 3):  # the leader may be mid-span
                a0 = c["ayah"] - back
                if a0 >= 1:
                    add(c["surah"], a0, c["ayah"])
        if not cands:
            return None
        token_lists = [
            self.store.verse_ids(s, a, a_end) for s, a, a_end in cands
        ]
        scores = score_token_lists(
            lp, t_valid, token_lists, blank_id=self.store.blank_id
        )
        best = None
        for (s, a, a_end), nll in zip(cands, scores):
            if not np.isfinite(nll):
                continue
            span = (a_end - a + 1) if a_end else 1
            final = -float(nll) - SPAN_PENALTY * (span - 1)
            if best is None or final > best[0]:
                best = (final, float(nll), s, a, a_end)
        if best is None:
            return None
        _final, nll, s, a, a_end = best
        import math as _math

        return {
            "surah": s, "ayah": a, "ayah_end": a_end,
            "score": _math.exp(-nll) if _math.isfinite(nll) else 0.0,
            "transcript": phonemes, "source": "phoneme-ctc",
        }

    def predict(self, path: str) -> dict:
        """Phoneme decode → phoneme-space retrieval → CTC forced-alignment
        rerank (reference: experiments/w2v-phonemes/run.py Levenshtein over
        quran_phonemes.json + the champion's rerank stage)."""
        if self.acoustics == "oracle":
            # synthetic path: render corrupted phoneme log-probs for the
            # sample's true refs (marked acoustics='oracle' in results)
            surah, ayah, _ = manifest_refs_for(path)[0]
            lp, t = self.runtime.render(surah, ayah)
            phonemes = self.store.decode_logprobs(lp, t)
        else:
            from tilawa_tpu.data.audio import load_audio as _load

            lp, t = self.runtime.log_probs(_load(path))
            phonemes = self.store.decode_logprobs(lp, t)
        seq = self._peel_sequence(phonemes)
        reranked = (
            self._ctc_rerank_phonemes(lp, t, phonemes, seq)
            if os.getenv("TILAWA_PHONEME_RERANK", "") not in ("", "0")
            else None
        )
        if len(seq) > 1:
            s0, a0, _ = seq[0]
            ayahs = [a for s, a, _sc in seq if s == s0]
            contiguous = (
                len(ayahs) == len(seq)
                and ayahs == list(range(a0, a0 + len(seq)))
            )
            if contiguous:
                # the peel can cover arbitrarily long recitations; the
                # rerank's span enumeration caps at 8 ayahs — only let the
                # rerank override when it covers at least as much
                r_span = (
                    (reranked["ayah_end"] or reranked["ayah"])
                    - reranked["ayah"] + 1
                ) if reranked else 0
                if reranked and r_span >= len(seq):
                    return reranked
                return {
                    "surah": s0, "ayah": a0,
                    "ayah_end": ayahs[-1],
                    "score": sum(sc for _s, _a, sc in seq) / len(seq),
                    "transcript": phonemes,
                }
        if reranked is not None:
            return reranked
        matches = self.store.match_verse(phonemes, top_k=5)
        # Vote-seeded span candidates: score each top rarity-vote run as a
        # whole span against the full phoneme string; a run that reads
        # better than the single-verse leader becomes the match.
        from tilawa_tpu.text.levenshtein import ratio as _ratio

        for v in self.store.ngram_vote(phonemes):
            a_end = min(v["ayah_end"], v["ayah"] + 7)
            ref = self.store.reference_phonemes(v["surah"], v["ayah"], a_end)
            if not ref:
                continue
            sc = _ratio(phonemes, ref)
            if not matches or sc > matches[0]["score"]:
                matches.insert(0, {
                    "surah": v["surah"], "ayah": v["ayah"],
                    "ayah_end": a_end if a_end > v["ayah"] else None,
                    "score": sc,
                })
        if seq and (not matches or seq[0][2] >= matches[0]["score"]):
            s0, a0, sc = seq[0]
            matches = [{"surah": s0, "ayah": a0, "score": sc}] + matches
        if not matches:
            return {"surah": 0, "ayah": 0, "ayah_end": None, "score": 0.0,
                    "transcript": phonemes}
        best = matches[0]
        return {
            "surah": best["surah"], "ayah": best["ayah"],
            "ayah_end": best.get("ayah_end"),
            "score": best["score"], "transcript": phonemes,
            "candidates": matches,
        }

    def detect_mispronunciations(self, surah: int, ayah: int) -> dict:
        if self.acoustics == "oracle":
            lp, t = self.runtime.render(surah, ayah)
            predicted = self.store.decode_logprobs(lp, t)
            return self.store.detect_mispronunciations(predicted, surah, ayah)
        raise NotImplementedError(
            "use pipeline.detect_mispronunciations(audio_path, ...) with "
            "real weights"
        )

    def model_size(self) -> int:
        if self.acoustics == "real":
            from tilawa_tpu.train.quantize import packed_size_bytes

            return packed_size_bytes(self.runtime.variables)
        return 0


class PrunedCTCExperiment:
    """Depth-pruned encoder variants behind the reference's list_models()
    multi-variant contract (reference: experiments/rabah-pruned-ctc/run.py
    list_models() over 12/8/6-layer first_n / evenly_spaced prunes;
    benchmark/runner.py:162-190 expands them). Variants derive from the
    latest trained checkpoint at selection time."""

    VARIANTS = {
        f"L{keep}-{mode}": (keep, mode)
        for keep in (12, 8, 6)
        for mode in ("first_n", "evenly_spaced")
    }

    def __init__(self):
        self._recognizers: dict[str, object] = {}
        self._current = "L12-evenly_spaced"

    def list_models(self) -> list[str]:
        return sorted(self.VARIANTS)

    def set_model(self, name: str) -> None:
        if name not in self.VARIANTS:
            raise KeyError(f"unknown model {name!r}; have {self.list_models()}")
        self._current = name

    def _recognizer(self):
        name = self._current
        if name not in self._recognizers:
            from tilawa_tpu.pipeline.predict import Recognizer
            from tilawa_tpu.pipeline.runtime import EncoderRuntime
            from tilawa_tpu.train.checkpoint import load_variables, shipped_checkpoint
            from tilawa_tpu.train.prune import prune_layers

            keep, mode = self.VARIANTS[name]
            ckpt = shipped_checkpoint()
            if ckpt:
                config, variables = load_variables(ckpt)
                config, variables = prune_layers(config, variables, keep, mode)
                runtime = EncoderRuntime(config, variables)
            else:
                from tilawa_tpu.models.fastconformer import FastConformerConfig

                runtime = EncoderRuntime(
                    FastConformerConfig.large(num_layers=keep)
                )
            self._recognizers[name] = Recognizer(runtime)
        return self._recognizers[name]

    def predict(self, path: str) -> dict:
        return self._recognizer().predict(path)

    def transcribe(self, path: str) -> str:
        return self._recognizer().transcribe(path)

    def model_size(self) -> int:
        from tilawa_tpu.train.quantize import packed_size_bytes

        return packed_size_bytes(self._recognizer().runtime.variables)


class TwoStageExperiment:
    """Two-stage ASR → CTC-rescore pipeline (reference: experiments/two-stage/
    run.py and two-stage-faster-whisper-pruned/run.py — a cheap generic ASR
    produces the transcript that drives candidate retrieval, then a separate
    CTC model rescores the candidates acoustically).

    Framework expression: stage 1 transcribes with a depth-pruned 6-layer
    encoder (a genuinely different, cheaper model standing in for the
    reference's Moonshine/faster-whisper), stage 2 builds candidates from
    that transcript and CTC-reranks them against the FULL champion's
    log-probs with the gate disabled (rerank_mode='always' — stage-1 text
    confidence must not bypass the rescue, mirroring the reference's
    always-rescore contract).
    """

    def __init__(self, stage1_layers: int = 12):
        self.stage1_layers = stage1_layers
        self._stage1 = None
        self._stage2 = None

    def _build(self):
        if self._stage2 is not None:
            return
        from tilawa_tpu.pipeline.predict import Recognizer
        from tilawa_tpu.pipeline.runtime import EncoderRuntime
        from tilawa_tpu.train.checkpoint import EXPORTS_DIR, load_variables, shipped_checkpoint
        from tilawa_tpu.train.prune import prune_layers

        # Stage-1 model resolution: a fine-tuned pruned checkpoint when one
        # exists (pruning without fine-tune produces garbage transcripts —
        # the reference fine-tuned its pruned variants too,
        # build_rabah_pruned_models.py), else prune-on-the-fly as a
        # structural fallback.
        ft = os.getenv(
            "TILAWA_STAGE1_CHECKPOINT",
            str(EXPORTS_DIR / f"pruned-L{self.stage1_layers}"),
        )
        if Path(ft).exists():
            p_config, p_variables = load_variables(ft)
            self._stage1 = Recognizer(EncoderRuntime(p_config, p_variables))
        else:
            ckpt = shipped_checkpoint()
            if ckpt:
                config, variables = load_variables(ckpt)
                p_config, p_variables = prune_layers(
                    config, variables, self.stage1_layers, "evenly_spaced"
                )
                self._stage1 = Recognizer(EncoderRuntime(p_config, p_variables))
            else:
                from tilawa_tpu.models.fastconformer import FastConformerConfig

                self._stage1 = Recognizer(
                    EncoderRuntime(
                        FastConformerConfig.large(num_layers=self.stage1_layers)
                    )
                )
        self._stage2 = _make_recognizer(tta=False, rerank_mode="always")

    def predict(self, path: str) -> dict:
        from tilawa_tpu.data.audio import load_audio

        self._build()
        audio = load_audio(path)
        transcript = self._stage1.transcribe_audio(audio)
        lp, _ids, t_valid = self._stage2.runtime.forward(audio)
        result = self._stage2._predict_from_logprobs(lp, t_valid, transcript)
        result["stage1_transcript"] = transcript
        return result

    def transcribe(self, path: str) -> str:
        self._build()
        return self._stage1.transcribe(path)

    def model_size(self) -> int:
        from tilawa_tpu.train.quantize import packed_size_bytes

        self._build()
        return packed_size_bytes(self._stage1.runtime.variables) + packed_size_bytes(
            self._stage2.runtime.variables
        )


@register("two-stage")
def _two_stage():
    return TwoStageExperiment()


@register("pruned-ctc")
def _pruned_ctc():
    return PrunedCTCExperiment()


@register("fastconformer-quran-lm-fusion")
def _lm_fusion():
    return LMFusionExperiment(error_rate=0.10, noise=1.0)


@register("fastconformer-phoneme")
def _fastconformer_phoneme():
    return PhonemeExperiment()


@register("oracle")
def _oracle():
    return OracleExperiment(error_rate=0.0, noise=0.3)


@register("oracle-hard")
def _oracle_hard():
    return OracleExperiment(error_rate=0.10, noise=1.0)


def _heldout_checkpoint() -> Path | None:
    """Newest artifact of the held-out campaign: TILAWA_HELDOUT_CKPT env,
    else exports/heldout-int4 if exported, else the highest-step checkpoint
    of the newest campaign phase (heldout2 = phase 1b continuation,
    heldout = phase 1)."""
    env = os.getenv("TILAWA_HELDOUT_CKPT")
    if env:
        return Path(env)
    export = Path("exports/heldout-int4")
    if (export / "variables.msgpack").exists():
        return export
    for run in ("heldout2", "heldout"):
        steps = sorted(Path("checkpoints").joinpath(run).glob("step_*"))
        if steps:
            return steps[-1]
    return None


@register("heldout")
def _heldout():
    """Champion pipeline on the HELD-OUT model: trained from scratch on
    v2+v3 audio only — v1 was never seen, so its v1 score is the
    generalization-honest accuracy claim (the shipped champion declares
    train==test overlap; the reference's own model never saw its test
    corpus — scripts/train_fastconformer_phoneme_modal.py:330-816)."""
    from tilawa_tpu.pipeline.predict import Recognizer
    from tilawa_tpu.pipeline.runtime import EncoderRuntime
    from tilawa_tpu.train.checkpoint import load_variables

    ckpt = _heldout_checkpoint()
    if ckpt is None:
        raise FileNotFoundError(
            "no held-out artifact: run tilawa_tpu.train.train --corpora v2,v3"
        )
    config, variables = load_variables(ckpt)
    return Recognizer(EncoderRuntime(config, variables), tta=True)
