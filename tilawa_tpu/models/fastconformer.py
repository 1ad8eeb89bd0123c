"""FastConformer-CTC encoder (Flax), the flagship acoustic model.

Architecture parity with the reference's champion model family —
nvidia/stt_ar_fastconformer_hybrid_large_pcd_v1.0's CTC branch (reference:
experiments/c2c-direct/run.py:50,171-184 drives preprocessor → encoder →
ctc_decoder) — re-expressed as idiomatic Flax/XLA:

  * in-graph log-mel frontend (tilawa_tpu.ops.frontend) fused under jit
  * 8x depthwise-striding conv subsampling (256 channels, 3 stages)
  * N conformer blocks: ½FF → rel-pos MHSA (Transformer-XL style with
    u/v biases) → conv module (pointwise+GLU, depthwise k=9, masked BN,
    SiLU) → ½FF → LayerNorm
  * CTC head: Dense(d_model → vocab+1) + log_softmax, blank = vocab_size

All sequence ops are length-masked so bucketed/padded batching is exact.
Compute dtype is configurable (bfloat16 on TPU; log_softmax always f32).

FastConformerConfig.large() ≈ the reference's 115 MB model scale
(17 layers, d_model 512, 8 heads, ff ×4, kernel 9 — NeMo FastConformer-L).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tilawa_tpu.ops.frontend import log_mel_spectrogram
from tilawa_tpu.ops.quant import INT4_BLOCK, int4_matmul, int4_matmul_xla

Dtype = Any


@dataclasses.dataclass(frozen=True)
class FastConformerConfig:
    vocab_size: int = 1024            # labels; blank id == vocab_size
    n_mels: int = 80
    d_model: int = 512
    num_layers: int = 17
    num_heads: int = 8
    ff_expansion: int = 4
    conv_kernel: int = 9
    subsampling_channels: int = 256
    subsampling_factor: int = 8
    dropout: float = 0.1
    dtype: Any = jnp.float32
    # lax.scan over the depth axis: one compiled block body for any depth.
    scan_layers: bool = True
    # Weight quantization for every Dense/matmul: None (fp) or "int4"
    # (packed-in-HBM, dequant-in-kernel — the reference's MatMulNBits
    # analogue; reference: experiments/c2c-direct-mixed/run.py:6-8).
    quant: str | None = None
    # Pallas kernels where available; False falls back to pure-XLA math
    # (CPU tests, virtual device meshes).
    use_pallas: bool = True
    # Rematerialize each conformer block in the backward pass: activation
    # memory drops from O(depth) to O(1) blocks at ~30% extra FLOPs
    # (training-only knob; HBM is the scaling wall, not the MXU).
    remat: bool = False
    # SpecAugment on the mel features, applied only when deterministic=False
    # (training). Off by default; training recipes switch it on
    # (tilawa_tpu/ops/specaug.py for why).
    sa_freq_masks: int = 0
    sa_freq_width: int = 27
    sa_time_masks: int = 0
    sa_time_frac: float = 0.05

    @property
    def blank_id(self) -> int:
        return self.vocab_size

    @property
    def num_classes(self) -> int:
        return self.vocab_size + 1

    @classmethod
    def large(cls, **kw) -> "FastConformerConfig":
        """Production scale; bfloat16 compute — the MXU's native dtype.
        The CTC head's log_softmax stays f32 regardless (see FastConformerCTC)."""
        base = dict(dtype=jnp.bfloat16)
        base.update(kw)
        return cls(**base)

    @classmethod
    def phoneme(cls, **kw) -> "FastConformerConfig":
        """69-token Buckwalter phoneme CTC head (reference:
        experiments/fastconformer-phoneme/run.py:43-55, blank at 69)."""
        base = dict(vocab_size=69)
        base.update(kw)
        return cls(**base)

    @classmethod
    def small(cls, **kw) -> "FastConformerConfig":
        """Test-scale config: same topology, tiny dims."""
        base = dict(
            d_model=64, num_layers=2, num_heads=4, ff_expansion=2,
            subsampling_channels=32,
        )
        base.update(kw)
        return cls(**base)


def subsampled_length(length, factor: int = 8):
    """Frame count after the striding conv stack (k=3, s=2, p=1 per stage)."""
    out = length
    stages = int(np.log2(factor))
    for _ in range(stages):
        out = (out - 1) // 2 + 1
    return out


class MaskedBatchNorm(nn.Module):
    """BatchNorm over (batch, time) that ignores padded frames."""

    use_running_average: bool
    momentum: float = 0.99
    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        # x: [B, T, C], mask: [B, T, 1] bool
        c = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros(c, jnp.float32))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones(c, jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)

        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            cnt = jnp.maximum(mask.sum(), 1).astype(jnp.float32)
            xf = x.astype(jnp.float32)
            mean = jnp.where(mask, xf, 0.0).sum(axis=(0, 1)) / cnt
            var = (jnp.where(mask, xf - mean, 0.0) ** 2).sum(axis=(0, 1)) / cnt
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.epsilon)
        return (y * scale + bias).astype(self.dtype)


# quant="mixed": module names whose kernels go int4 (the FFN bulk);
# every other eligible Dense goes int8. See make_dense below.
MIXED_INT4_NAMES = frozenset({"lin1", "lin2"})


class Int4Dense(nn.Module):
    """Dense over packed int4 weights, dequantized inside the matmul kernel.

    Parameters: `packed` uint8 [K//2, N] (split-half nibble layout),
    `scales` f32 [K/INT4_BLOCK, N], optional `bias`. Random init draws a
    lecun-normal fp kernel's statistics directly in packed space so
    latency benchmarks run the true compute path without a converted
    checkpoint; real weights come from train.quantize.quantize_variables.
    """

    features: int
    cfg: FastConformerConfig
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = x.shape[-1]
        if k % 2:
            raise ValueError(f"int4 dense needs even fan-in, got {k}")
        kb = -(-k // INT4_BLOCK)

        def init_packed(rng, shape, _dtype):
            return jax.random.randint(rng, shape, 0, 256, dtype=jnp.uint8)

        def init_scales(rng, shape, _dtype):
            # |q| <= 7; match lecun-normal std 1/sqrt(K): scale = 1/(7*sqrt(K))
            return jnp.full(shape, 1.0 / (7.0 * np.sqrt(k)), jnp.float32)

        packed = self.param("packed", init_packed, (k // 2, self.features), jnp.uint8)
        scales = self.param("scales", init_scales, (kb, self.features), jnp.float32)
        matmul = int4_matmul if self.cfg.use_pallas else int4_matmul_xla
        y = matmul(x, packed, scales).astype(self.cfg.dtype)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,),
                              jnp.float32)
            y = y + bias.astype(self.cfg.dtype)
        return y


class Int8Dense(nn.Module):
    """Dense over int8 weights with per-output-column scales.

    y[n] = (x @ q[:, n]) * scale[n] — the scale factors out of the
    contraction exactly, so the int8 matrix feeds the MXU directly (cast
    to bf16) and no dequantized [K, N] copy ever materializes. ~2x the
    bytes of int4 but numerically much closer to fp: crop-trained
    streaming checkpoints lose ~11pp seq-acc under int4 (partial-window
    logits sit near decision boundaries) and survive int8 (round-3
    measurement; the reference similarly keeps Conv/LayerNorm at int8 in
    its mixed export, c2c-direct-mixed/run.py:6-8)."""

    features: int
    cfg: FastConformerConfig
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = x.shape[-1]

        def init_q(rng, shape, _dtype):
            # sample in int32: maxval=128 would wrap when cast to int8
            return jax.random.randint(rng, shape, -127, 128).astype(jnp.int8)

        def init_scales(rng, shape, _dtype):
            return jnp.full(shape, 1.0 / (127.0 * np.sqrt(k)), jnp.float32)

        q = self.param("q", init_q, (k, self.features), jnp.int8)
        scales = self.param("scales", init_scales, (self.features,), jnp.float32)
        y = jnp.dot(x.astype(self.cfg.dtype), q.astype(self.cfg.dtype))
        y = y * scales.astype(self.cfg.dtype)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,),
                              jnp.float32)
            y = y + bias.astype(self.cfg.dtype)
        return y


def make_dense(cfg: FastConformerConfig, features: int, name: str,
               use_bias: bool = True):
    """Dense factory: fp nn.Dense, Int4Dense, or Int8Dense per cfg.quant,
    same param path."""
    if cfg.quant == "int4":
        return Int4Dense(features, cfg=cfg, use_bias=use_bias, name=name)
    if cfg.quant == "int8":
        return Int8Dense(features, cfg=cfg, use_bias=use_bias, name=name)
    if cfg.quant == "mixed":
        # The reference ships ONE mixed model for batch AND streaming:
        # int4 on the MatMul bulk, int8 elsewhere (reference:
        # experiments/c2c-direct-mixed/run.py:6-8, export_metadata.json
        # "int4 MatMul + int8 Conv/LayerNorm"). Here the int4 set is the
        # feed-forward pair — the parameter bulk — while the decision-
        # critical projections (attention, conv pointwise, CTC head) stay
        # int8: full-Dense int4 measurably craters crop-trained streaming
        # logits (EXPERIMENTS.md round-3 quantization entry).
        cls = Int4Dense if name in MIXED_INT4_NAMES else Int8Dense
        return cls(features, cfg=cfg, use_bias=use_bias, name=name)
    if cfg.quant is not None:
        raise ValueError(f"unknown quant mode {cfg.quant!r}")
    return nn.Dense(features, dtype=cfg.dtype, use_bias=use_bias, name=name)


def _stride2_len(length):
    return (length - 1) // 2 + 1


class ConvSubsampling(nn.Module):
    """Depthwise-striding 8x subsampling (NeMo dw_striding equivalent).

    Time frames beyond each sample's true length are re-zeroed after every
    strided stage so stride-2 taps never read bias-polluted padding —
    padded-batch outputs are bit-identical to unpadded ones.
    """

    cfg: FastConformerConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
        # x: [B, T, n_mels], lengths: [B] valid frame counts -> [B, T/8, d_model]
        cfg = self.cfg
        ch = cfg.subsampling_channels

        def time_mask(h, lens):
            return jnp.where(
                (jnp.arange(h.shape[1])[None, :] < lens[:, None])[:, :, None, None],
                h, 0.0,
            )

        h = x[..., None].astype(cfg.dtype)  # [B, T, M, 1]
        h = nn.Conv(ch, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    dtype=cfg.dtype, name="conv_in")(h)
        h = nn.relu(h)
        lens = _stride2_len(lengths)
        h = time_mask(h, lens)
        stages = int(np.log2(cfg.subsampling_factor)) - 1
        for i in range(stages):
            h = nn.Conv(ch, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                        feature_group_count=ch, dtype=cfg.dtype,
                        name=f"dw_conv_{i}")(h)
            h = nn.Conv(ch, (1, 1), dtype=cfg.dtype, name=f"pw_conv_{i}")(h)
            h = nn.relu(h)
            lens = _stride2_len(lens)
            h = time_mask(h, lens)
        b, t, f, _ = h.shape
        h = h.reshape(b, t, f * ch)
        return make_dense(cfg, cfg.d_model, "proj")(h)


class FeedForward(nn.Module):
    cfg: FastConformerConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool) -> jnp.ndarray:
        cfg = self.cfg
        h = nn.LayerNorm(dtype=cfg.dtype)(x)
        h = make_dense(cfg, cfg.d_model * cfg.ff_expansion, "lin1")(h)
        h = nn.silu(h)
        h = nn.Dropout(cfg.dropout, deterministic=deterministic)(h)
        h = make_dense(cfg, cfg.d_model, "lin2")(h)
        return nn.Dropout(cfg.dropout, deterministic=deterministic)(h)


def rel_positional_encoding(t: int, d_model: int) -> np.ndarray:
    """Sinusoidal embeddings for relative positions T-1 .. -(T-1),
    indexed so row k encodes relative position (T-1) - k."""
    positions = np.arange(t - 1, -t, -1, dtype=np.float64)  # [2T-1]
    inv_freq = 1.0 / (10000.0 ** (np.arange(0, d_model, 2) / d_model))
    ang = positions[:, None] * inv_freq[None, :]
    emb = np.zeros((2 * t - 1, d_model), dtype=np.float32)
    emb[:, 0::2] = np.sin(ang)
    emb[:, 1::2] = np.cos(ang)
    return emb


class RelPosSelfAttention(nn.Module):
    """Transformer-XL relative-position MHSA with u/v biases."""

    cfg: FastConformerConfig

    @staticmethod
    def _rel_shift(qp: jnp.ndarray, t: int) -> jnp.ndarray:
        """[B,H,T,2T-1] → [B,H,T,T] with out[..., i, j] = qp[..., i, T-1-i+j]."""
        b, h, _t, _k = qp.shape
        x = jnp.pad(qp, ((0, 0), (0, 0), (0, 0), (1, 0)))      # [B,H,T,2T]
        x = x.reshape(b, h, 2 * t, t)
        x = x[:, :, 1:, :]                                     # [B,H,2T-1,T]
        x = x.reshape(b, h, t, 2 * t - 1)
        return x[..., :t]

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, mask: jnp.ndarray, deterministic: bool
    ) -> jnp.ndarray:
        cfg = self.cfg
        b, t, d = x.shape
        h, dh = cfg.num_heads, d // cfg.num_heads

        q = make_dense(cfg, d, "q")(x).reshape(b, t, h, dh)
        k = make_dense(cfg, d, "k")(x).reshape(b, t, h, dh)
        v = make_dense(cfg, d, "v")(x).reshape(b, t, h, dh)

        pos = jnp.asarray(rel_positional_encoding(t, d), dtype=cfg.dtype)
        p = make_dense(cfg, d, "pos", use_bias=False)(pos)
        p = p.reshape(2 * t - 1, h, dh)

        bias_u = self.param("bias_u", nn.initializers.zeros, (h, dh), jnp.float32)
        bias_v = self.param("bias_v", nn.initializers.zeros, (h, dh), jnp.float32)

        qu = q + bias_u.astype(cfg.dtype)
        qv = q + bias_v.astype(cfg.dtype)

        content = jnp.einsum("bihd,bjhd->bhij", qu, k)
        # qp[b,h,i,k] over 2T-1 relative rows; row index k encodes rel
        # position (T-1)-k, and (i,j) needs rel position i-j → k = T-1-i+j.
        # The Transformer-XL rel-shift (pad+reshape) realizes that gather as
        # pure layout ops — no take_along_axis, which XLA lowers to a slow
        # dynamic-gather on TPU.
        qp = jnp.einsum("bihd,khd->bhik", qv, p)  # [B,H,T,2T-1]
        pos_score = self._rel_shift(qp, t)
        scores = (content + pos_score) / np.sqrt(dh)

        key_mask = mask[:, None, None, :, 0]  # [B,1,1,T]
        scores = jnp.where(key_mask, scores, -1e30)
        attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(cfg.dtype)
        attn = nn.Dropout(cfg.dropout, deterministic=deterministic)(attn)
        out = jnp.einsum("bhij,bjhd->bihd", attn, v).reshape(b, t, d)
        return make_dense(cfg, d, "out")(out)


class ConvModule(nn.Module):
    cfg: FastConformerConfig

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, mask: jnp.ndarray, deterministic: bool,
        use_running_average: bool,
    ) -> jnp.ndarray:
        cfg = self.cfg
        d = cfg.d_model
        h = nn.LayerNorm(dtype=cfg.dtype)(x)
        h = make_dense(cfg, 2 * d, "pw1")(h)
        h = nn.glu(h, axis=-1)
        h = jnp.where(mask, h, 0.0)  # keep padded frames out of the conv taps
        pad = (cfg.conv_kernel - 1) // 2
        h = nn.Conv(
            d, (cfg.conv_kernel,), padding=((pad, pad),), feature_group_count=d,
            dtype=cfg.dtype, name="dw",
        )(h)
        h = MaskedBatchNorm(
            use_running_average=use_running_average, dtype=cfg.dtype, name="bn"
        )(h, mask)
        h = nn.silu(h)
        h = make_dense(cfg, d, "pw2")(h)
        return nn.Dropout(cfg.dropout, deterministic=deterministic)(h)


class ConformerBlock(nn.Module):
    cfg: FastConformerConfig

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, mask: jnp.ndarray, deterministic: bool,
        use_running_average: bool,
    ) -> jnp.ndarray:
        cfg = self.cfg
        x = x + 0.5 * FeedForward(cfg, name="ff1")(x, deterministic)
        x = x + RelPosSelfAttention(cfg, name="attn")(
            nn.LayerNorm(dtype=cfg.dtype, name="attn_ln")(x), mask, deterministic
        )
        x = x + ConvModule(cfg, name="conv")(
            x, mask, deterministic, use_running_average
        )
        x = x + 0.5 * FeedForward(cfg, name="ff2")(x, deterministic)
        return nn.LayerNorm(dtype=cfg.dtype, name="final_ln")(x)


class _ScanBlock(nn.Module):
    """ConformerBlock wrapped as a scan body: (carry, _) -> (carry, None).

    Stacking the depth axis under lax.scan means XLA compiles ONE block
    body for any num_layers — compile time is depth-independent, which
    matters when every program shape is a fresh remote compile."""

    cfg: FastConformerConfig

    @nn.compact
    def __call__(self, x, _unused, mask, deterministic, use_running_average):
        y = ConformerBlock(self.cfg, name="block")(
            x, mask, deterministic, use_running_average
        )
        return y, None


class FastConformerCTC(nn.Module):
    """Raw audio → CTC log-probs, end to end under one jit."""

    cfg: FastConformerConfig

    @nn.compact
    def __call__(
        self,
        audio: jnp.ndarray,      # [B, N] float32 waveform
        lengths: jnp.ndarray,    # [B] int32 sample counts
        deterministic: bool = True,
        use_running_average: bool = True,
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        cfg = self.cfg
        # Fused Pallas frontend on real TPUs; XLA path elsewhere (CPU tests,
        # virtual meshes) — bit-compatible numerics either way.
        use_pallas_mel = cfg.use_pallas and jax.default_backend() == "tpu"
        feats, feat_lengths = log_mel_spectrogram(
            audio, lengths, use_pallas=use_pallas_mel
        )
        if not deterministic and (cfg.sa_freq_masks or cfg.sa_time_masks):
            from tilawa_tpu.ops.specaug import spec_augment

            feats = spec_augment(
                feats, feat_lengths, self.make_rng("dropout"),
                freq_masks=cfg.sa_freq_masks, freq_width=cfg.sa_freq_width,
                time_masks=cfg.sa_time_masks, time_frac=cfg.sa_time_frac,
            )
        x = ConvSubsampling(cfg, name="subsampling")(feats, feat_lengths)
        enc_lengths = subsampled_length(feat_lengths, cfg.subsampling_factor)
        t = x.shape[1]
        mask = (jnp.arange(t)[None, :] < enc_lengths[:, None])[..., None]

        x = jnp.where(mask, x, 0.0)
        if cfg.scan_layers:
            body = _ScanBlock
            if cfg.remat:
                body = nn.remat(
                    _ScanBlock,
                    static_argnums=(4, 5),  # deterministic, use_running_average
                )
            scanned = nn.scan(
                body,
                variable_axes={"params": 0, "batch_stats": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=(nn.broadcast, nn.broadcast, nn.broadcast, nn.broadcast),
                length=cfg.num_layers,
            )(cfg, name="blocks")
            x, _ = scanned(
                x, None, mask, deterministic, use_running_average
            )
        else:
            for i in range(cfg.num_layers):
                x = ConformerBlock(cfg, name=f"block_{i}")(
                    x, mask, deterministic, use_running_average
                )

        logits = make_dense(cfg, cfg.num_classes, "ctc_head")(x)
        log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        return log_probs, enc_lengths.astype(jnp.int32)


def count_params(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))


def forward_flops(cfg: FastConformerConfig, audio_seconds: float) -> float:
    """Analytic matmul FLOPs of one encoder forward over `audio_seconds`
    of 16 kHz audio (multiply+add counted as 2). Used for the bench MFU
    estimate against the v5e bf16 peak; conv-subsampling and the T^2
    attention-score terms are included, elementwise/norm work is not
    (negligible against the matmuls)."""
    d = cfg.d_model
    t_mel = audio_seconds * 100.0                    # 160-sample hop
    t_enc = t_mel / cfg.subsampling_factor
    ch = cfg.subsampling_channels
    # dw-striding stages: pointwise-ish channel mixing at T/2, T/4, T/8
    sub = 2 * (t_mel / 2 * 9 * cfg.n_mels * ch
               + t_mel / 4 * 9 * ch * ch
               + t_mel / 8 * 9 * ch * ch)
    proj = 2 * t_enc * (ch * cfg.n_mels // cfg.subsampling_factor) * d
    ff = 2 * 2 * (2 * d * cfg.ff_expansion * d)       # macaron pair / frame
    attn_proj = 2 * 5 * d * d                         # q,k,v,pos,out / frame
    conv = 2 * (d * 2 * d + cfg.conv_kernel * d + d * d)
    per_frame = ff + attn_proj + conv
    scores = 4 * t_enc * t_enc * d * cfg.num_layers   # qk^T + att*v
    layers = cfg.num_layers * per_frame * t_enc + scores
    head = 2 * t_enc * d * (cfg.vocab_size + 1)
    return float(sub + proj + layers + head)
