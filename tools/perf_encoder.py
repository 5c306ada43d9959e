"""Encoder MFU experiments on the live TPU (VERDICT r1 #3).

Measures large-v3-turbo encoder variants at b=16 and prints ms + MFU per
variant. Methodology per docs/BENCHMARKS.md: warmup compile, median of 5,
np.asarray of a scalar reduction to force completion (block_until_ready is
unreliable over the axon relay).

Run: python tools/perf_encoder.py [--variants v0,v1,...]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from whisperkit_tpu.core.compile_cache import enable_compilation_cache
from whisperkit_tpu.models.whisper import (
    VARIANT_DIMS,
    _attend,
    _conv1d,
    _merge_heads,
    _prec,
    _split_heads,
    dense,
    encoder_forward,
    init_params,
    layer_norm,
)

DIMS = VARIANT_DIMS["large-v3-turbo"]
B = 16

# encoder FLOPs (matmuls only): conv1 + conv2 + per-layer (qkv+out+mlp+attn)
D = DIMS.n_audio_state
T = 1500
L = DIMS.n_audio_layer
FLOPS = (
    2 * B * 3000 * D * DIMS.n_mels * 3  # conv1
    + 2 * B * T * D * D * 3  # conv2 (stride 2)
    + L * (4 * 2 * B * T * D * D + 2 * 2 * B * T * D * 4 * D + 2 * 2 * B * T * T * D)
)
V5E_PEAK = 197e12  # bf16 TFLOPS


def fuse_qkv(params):
    """Pre-fuse q/k/v (and their biases) into one [D, 3D] projection."""

    def per_block(bp):
        # stacked blocks: weights are [L, D, D], biases [L, D]
        a = bp["attn"]
        wq, wk, wv = a["q"]["w"], a["k"]["w"], a["v"]["w"]
        w = jnp.concatenate([wq, wk, wv], axis=-1)
        b = jnp.concatenate(
            [a["q"]["b"], jnp.zeros_like(a["q"]["b"]), a["v"]["b"]], axis=-1
        )
        out = dict(bp)
        out["attn"] = {"qkv": {"w": w, "b": b}, "out": a["out"]}
        return out

    enc = dict(params["encoder"])
    enc["blocks"] = jax.tree.map(
        lambda x: x, per_block(params["encoder"]["blocks"])
    )
    return {**params, "encoder": enc}


def encoder_v1(params, mel, dims):
    """Fused-QKV encoder."""
    enc = params["encoder"]
    x = jax.nn.gelu(_conv1d(mel, enc["conv1"]["w"], enc["conv1"]["b"], 1))
    x = jax.nn.gelu(_conv1d(x, enc["conv2"]["w"], enc["conv2"]["b"], 2))
    x = x.transpose(0, 2, 1)
    x = x + enc["pos_embed"].astype(x.dtype)
    n_head = dims.n_audio_head

    def block(x, bp):
        h = layer_norm(x, bp["attn_ln"])
        qkv = dense(h, bp["attn"]["qkv"])
        q, k, v = jnp.split(qkv, 3, axis=-1)
        out = _attend(
            _split_heads(q, n_head), _split_heads(k, n_head), _split_heads(v, n_head)
        )
        x = x + dense(_merge_heads(out), bp["attn"]["out"])
        h = layer_norm(x, bp["mlp_ln"])
        x = x + dense(jax.nn.gelu(dense(h, bp["fc1"])), bp["fc2"])
        return x, None

    x, _ = jax.lax.scan(block, x, enc["blocks"])
    return layer_norm(x, enc["ln_post"])


def _attend_bf16(q, k, v):
    scale = q.shape[-1] ** -0.25
    scores = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k * scale)
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v)


def encoder_v2(params, mel, dims):
    """Fused-QKV + bf16 attention scores (halves score-tensor HBM traffic)."""
    enc = params["encoder"]
    x = jax.nn.gelu(_conv1d(mel, enc["conv1"]["w"], enc["conv1"]["b"], 1))
    x = jax.nn.gelu(_conv1d(x, enc["conv2"]["w"], enc["conv2"]["b"], 2))
    x = x.transpose(0, 2, 1)
    x = x + enc["pos_embed"].astype(x.dtype)
    n_head = dims.n_audio_head

    def block(x, bp):
        h = layer_norm(x, bp["attn_ln"])
        qkv = dense(h, bp["attn"]["qkv"])
        q, k, v = jnp.split(qkv, 3, axis=-1)
        out = _attend_bf16(
            _split_heads(q, n_head), _split_heads(k, n_head), _split_heads(v, n_head)
        )
        x = x + dense(_merge_heads(out), bp["attn"]["out"])
        h = layer_norm(x, bp["mlp_ln"])
        x = x + dense(jax.nn.gelu(dense(h, bp["fc1"])), bp["fc2"])
        return x, None

    x, _ = jax.lax.scan(block, x, enc["blocks"])
    return layer_norm(x, enc["ln_post"])


def encoder_v3(params, mel, dims):
    """v2 + channels-last convs (TPU-preferred NWC layout)."""
    enc = params["encoder"]

    def conv_nwc(x_nwc, w_oik, b, stride):
        # w [O, I, K] -> [K, I, O]
        w = w_oik.transpose(2, 1, 0)
        y = jax.lax.conv_general_dilated(
            x_nwc.astype(w.dtype), w, (stride,), [(1, 1)],
            dimension_numbers=("NWC", "WIO", "NWC"), precision=_prec(w),
        )
        return y + b[None, None, :]

    x = mel.transpose(0, 2, 1)  # [B, 3000, n_mels]
    x = jax.nn.gelu(conv_nwc(x, enc["conv1"]["w"], enc["conv1"]["b"], 1))
    x = jax.nn.gelu(conv_nwc(x, enc["conv2"]["w"], enc["conv2"]["b"], 2))
    x = x + enc["pos_embed"].astype(x.dtype)
    n_head = dims.n_audio_head

    def block(x, bp):
        h = layer_norm(x, bp["attn_ln"])
        qkv = dense(h, bp["attn"]["qkv"])
        q, k, v = jnp.split(qkv, 3, axis=-1)
        out = _attend_bf16(
            _split_heads(q, n_head), _split_heads(k, n_head), _split_heads(v, n_head)
        )
        x = x + dense(_merge_heads(out), bp["attn"]["out"])
        h = layer_norm(x, bp["mlp_ln"])
        x = x + dense(jax.nn.gelu(dense(h, bp["fc1"])), bp["fc2"])
        return x, None

    x, _ = jax.lax.scan(block, x, enc["blocks"])
    return layer_norm(x, enc["ln_post"])


def encoder_v4(params, mel, dims):
    """v3 + jax.nn.dot_product_attention (XLA fused attention path)."""
    enc = params["encoder"]

    def conv_nwc(x_nwc, w_oik, b, stride):
        w = w_oik.transpose(2, 1, 0)
        y = jax.lax.conv_general_dilated(
            x_nwc.astype(w.dtype), w, (stride,), [(1, 1)],
            dimension_numbers=("NWC", "WIO", "NWC"), precision=_prec(w),
        )
        return y + b[None, None, :]

    x = mel.transpose(0, 2, 1)
    x = jax.nn.gelu(conv_nwc(x, enc["conv1"]["w"], enc["conv1"]["b"], 1))
    x = jax.nn.gelu(conv_nwc(x, enc["conv2"]["w"], enc["conv2"]["b"], 2))
    x = x + enc["pos_embed"].astype(x.dtype)
    n_head = dims.n_audio_head
    dh = dims.n_audio_state // n_head

    def block(x, bp):
        b_, t_, d_ = x.shape
        h = layer_norm(x, bp["attn_ln"])
        qkv = dense(h, bp["attn"]["qkv"])
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b_, t_, n_head, dh)
        k = k.reshape(b_, t_, n_head, dh)
        v = v.reshape(b_, t_, n_head, dh)
        out = jax.nn.dot_product_attention(q, k, v)
        x = x + dense(out.reshape(b_, t_, d_), bp["attn"]["out"])
        h = layer_norm(x, bp["mlp_ln"])
        x = x + dense(jax.nn.gelu(dense(h, bp["fc1"])), bp["fc2"])
        return x, None

    x, _ = jax.lax.scan(block, x, enc["blocks"])
    return layer_norm(x, enc["ln_post"])


def _attend_bf16_f32softmax(q, k, v):
    """bf16 score materialization, f32 softmax arithmetic (fused elementwise)."""
    scale = q.shape[-1] ** -0.25
    scores = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k * scale)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v)


def _make_encoder(attend, fused_qkv):
    def enc_fn(params, mel, dims):
        enc = params["encoder"]
        x = jax.nn.gelu(_conv1d(mel, enc["conv1"]["w"], enc["conv1"]["b"], 1))
        x = jax.nn.gelu(_conv1d(x, enc["conv2"]["w"], enc["conv2"]["b"], 2))
        x = x.transpose(0, 2, 1)
        x = x + enc["pos_embed"].astype(x.dtype)
        n_head = dims.n_audio_head

        def block(x, bp):
            h = layer_norm(x, bp["attn_ln"])
            if fused_qkv:
                qkv = dense(h, bp["attn"]["qkv"])
                q, k, v = jnp.split(qkv, 3, axis=-1)
            else:
                q = dense(h, bp["attn"]["q"])
                k = dense(h, bp["attn"]["k"])
                v = dense(h, bp["attn"]["v"])
            out = attend(
                _split_heads(q, n_head), _split_heads(k, n_head), _split_heads(v, n_head)
            )
            x = x + dense(_merge_heads(out), bp["attn"]["out"])
            h = layer_norm(x, bp["mlp_ln"])
            x = x + dense(jax.nn.gelu(dense(h, bp["fc1"])), bp["fc2"])
            return x, None

        x, _ = jax.lax.scan(block, x, enc["blocks"])
        return layer_norm(x, enc["ln_post"])

    return enc_fn


def _attend_flash(q, k, v):
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        flash_attention,
    )

    # block sizes must divide kv_seq_len=1500 (not a multiple of 128)
    bs = BlockSizes(
        block_q=500, block_k_major=500, block_k=500, block_b=1,
        block_q_major_dkv=500, block_k_major_dkv=500, block_k_dkv=500,
        block_q_dkv=500, block_k_major_dq=500, block_k_dq=500, block_q_dq=500,
    )
    # flash kernel applies sm_scale to q only; whisper's dh^-0.25 on both
    # sides equals dh^-0.5 on q
    return flash_attention(
        q, k, v, causal=False, sm_scale=q.shape[-1] ** -0.5, block_sizes=bs
    )


def _attend_flash_padded(q, k, v):
    """Pallas flash attention; seq padded 1500→1536 (×128) with segment-id
    masking of the pad keys, output sliced back."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention,
    )

    b, h, t, dh = q.shape
    tp = ((t + 127) // 128) * 128
    pad = tp - t
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
    seg = (jnp.arange(tp) < t).astype(jnp.int32)[None, :].repeat(b, 0)
    bs = BlockSizes(
        block_q=512, block_k_major=512, block_k=512, block_b=1,
        block_q_major_dkv=512, block_k_major_dkv=512, block_k_dkv=512,
        block_q_dkv=512, block_k_major_dq=512, block_k_dq=512, block_q_dq=512,
    )
    out = flash_attention(
        qp, kp, vp, causal=False, sm_scale=dh ** -0.5,
        segment_ids=SegmentIds(q=seg, kv=seg), block_sizes=bs,
    )
    return out[:, :, :t, :]


def _conv2_as_matmul(x, w, b):
    """Stride-2 kernel-3 conv as one [3*C_in → C_out] matmul over 1500
    output positions (ROADMAP conv2-as-matmul lever): x [B,C,3000] padded
    by 1, three stride-2 slices stacked on a window axis, contracted with
    w [O,I,K] over (I,K) = a 3840-deep MXU matmul instead of a conv."""
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1)))
    cols = jnp.stack(
        [xp[:, :, 0:3000:2], xp[:, :, 1:3001:2], xp[:, :, 2:3002:2]], axis=-1
    )  # [B, C_in, 1500, 3]
    y = jnp.einsum(
        "bitk,oik->bot", cols.astype(w.dtype), w, precision=_prec(w)
    )
    return y + b[None, :, None]


def encoder_v12(params, mel, dims):
    """Production v9 attention + conv2-as-matmul."""
    enc = params["encoder"]
    x = jax.nn.gelu(_conv1d(mel, enc["conv1"]["w"], enc["conv1"]["b"], 1))
    x = jax.nn.gelu(_conv2_as_matmul(x, enc["conv2"]["w"], enc["conv2"]["b"]))
    x = x.transpose(0, 2, 1)
    x = x + enc["pos_embed"].astype(x.dtype)
    n_head = dims.n_audio_head

    def block(x, bp):
        h = layer_norm(x, bp["attn_ln"])
        q = dense(h, bp["attn"]["q"])
        k = dense(h, bp["attn"]["k"])
        v = dense(h, bp["attn"]["v"])
        out = _attend_bf16(
            _split_heads(q, n_head), _split_heads(k, n_head), _split_heads(v, n_head)
        )
        x = x + dense(_merge_heads(out), bp["attn"]["out"])
        h = layer_norm(x, bp["mlp_ln"])
        x = x + dense(jax.nn.gelu(dense(h, bp["fc1"])), bp["fc2"])
        return x, None

    x, _ = jax.lax.scan(block, x, enc["blocks"])
    return layer_norm(x, enc["ln_post"])


def _attend_onepass_768(q, k, v):
    from whisperkit_tpu.ops.attention import mha_encoder_pallas

    return mha_encoder_pallas(q, k, v, block_q=768)


def _attend_onepass_512(q, k, v):
    from whisperkit_tpu.ops.attention import mha_encoder_pallas

    return mha_encoder_pallas(q, k, v, block_q=512)


def _attend_splash(q, k, v):
    """Splash-attention kernel (the maintained TPU pallas MHA), 1536-padded
    with segment-id masking of pad positions."""
    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_kernel as sk,
        splash_attention_mask as sm,
    )

    b, h, t, dh = q.shape
    tp = ((t + 127) // 128) * 128
    pad = tp - t
    qp = jnp.pad(q * (dh**-0.5), ((0, 0), (0, 0), (0, pad), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
    seg = (jnp.arange(tp) < t).astype(jnp.int32)
    mask = sm.MultiHeadMask([sm.FullMask(_shape=(tp, tp)) for _ in range(h)])
    kernel = sk.make_splash_mha(mask=mask, head_shards=1, q_seq_shards=1)
    segment_ids = sk.SegmentIds(q=seg, kv=seg)
    out = jax.vmap(lambda qq, kk, vv: kernel(qq, kk, vv, segment_ids=segment_ids))(
        qp, kp, vp
    )
    return out[:, :, :t, :]


def _dense_a8(x, p):
    """W8A8 when the param is int8-quantized; the bf16 path otherwise."""
    from whisperkit_tpu.ops.quant import quantized_matmul_w8a8

    if "w_q" in p:
        y = quantized_matmul_w8a8(x, p)
    else:
        y = jnp.dot(x, p["w"], precision=_prec(x, p["w"]))
    if "b" in p:
        y = y + p["b"]
    return y


def encoder_v16(params, mel, dims):
    """Production path (separate qkv, bf16 scores) with every block linear
    as an int8×int8 W8A8 dot (params must be quantize_whisper_params'd).
    Convs and attention stay bf16."""
    enc = params["encoder"]
    x = jax.nn.gelu(_conv1d(mel, enc["conv1"]["w"], enc["conv1"]["b"], 1))
    x = jax.nn.gelu(_conv1d(x, enc["conv2"]["w"], enc["conv2"]["b"], 2))
    x = x.transpose(0, 2, 1)
    x = x + enc["pos_embed"].astype(x.dtype)
    n_head = dims.n_audio_head

    def block(x, bp):
        h = layer_norm(x, bp["attn_ln"])
        q = _dense_a8(h, bp["attn"]["q"])
        k = _dense_a8(h, bp["attn"]["k"])
        v = _dense_a8(h, bp["attn"]["v"])
        out = _attend_bf16(
            _split_heads(q, n_head), _split_heads(k, n_head), _split_heads(v, n_head)
        )
        x = x + _dense_a8(_merge_heads(out), bp["attn"]["out"])
        h = layer_norm(x, bp["mlp_ln"])
        x = x + _dense_a8(jax.nn.gelu(_dense_a8(h, bp["fc1"])), bp["fc2"])
        return x, None

    x, _ = jax.lax.scan(block, x, enc["blocks"])
    return layer_norm(x, enc["ln_post"])


def measure(fn, params, mel, label):
    jitted = jax.jit(fn)
    t0 = time.perf_counter()
    out = jitted(params, mel)
    _ = np.asarray(out.mean())
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = jitted(params, mel)
        _ = np.asarray(jnp.mean(out))
        times.append(time.perf_counter() - t0)
    ms = float(np.median(times)) * 1e3
    mfu = FLOPS / (ms / 1e3) / V5E_PEAK
    print(f"{label}: {ms:.1f} ms  MFU {mfu*100:.1f}%  (compile {compile_s:.0f}s)", flush=True)
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="v0,v1,v2,v3,v4")
    args = ap.parse_args()
    enable_compilation_cache()

    params = init_params(jax.random.PRNGKey(0), DIMS)
    mel = jax.random.normal(jax.random.PRNGKey(1), (B, DIMS.n_mels, 3000), jnp.float32)
    fused = fuse_qkv(params)
    variants = {
        "v0": (lambda p, m: encoder_forward(p, m, DIMS), params),
        "v1": (lambda p, m: encoder_v1(p, m, DIMS), fused),
        "v2": (lambda p, m: encoder_v2(p, m, DIMS), fused),
        "v3": (lambda p, m: encoder_v3(p, m, DIMS), fused),
        "v4": (lambda p, m: encoder_v4(p, m, DIMS), fused),
        # isolate: separate qkv + bf16 scores / f32 softmax
        "v5": (lambda p, m: _make_encoder(_attend_bf16_f32softmax, False)(p, m, DIMS), params),
        # fused qkv + bf16 scores / f32 softmax
        "v6": (lambda p, m: _make_encoder(_attend_bf16_f32softmax, True)(p, m, DIMS), fused),
        # Pallas flash attention (no scores materialization)
        "v7": (lambda p, m: _make_encoder(_attend_flash, True)(p, m, DIMS), fused),
        "v8": (lambda p, m: _make_encoder(_attend_flash, False)(p, m, DIMS), params),
        # separate qkv + pure-bf16 softmax (isolate fused-qkv effect vs v2)
        "v9": (lambda p, m: _make_encoder(_attend_bf16, False)(p, m, DIMS), params),
        # flash attention on 1536-padded seq with segment-id masking
        "v10": (lambda p, m: _make_encoder(_attend_flash_padded, False)(p, m, DIMS), params),
        "v11": (lambda p, m: _make_encoder(_attend_flash_padded, True)(p, m, DIMS), fused),
        # r3 levers: conv2-as-matmul on the production path; splash MHA
        "v12": (lambda p, m: encoder_v12(p, m, DIMS), params),
        "v13": (lambda p, m: _make_encoder(_attend_splash, False)(p, m, DIMS), params),
        # r5: one-pass full-K-resident Pallas MHA (ops/attention.py) — no
        # online-softmax rescaling, no probs materialization
        "v14": (lambda p, m: _make_encoder(_attend_onepass_768, False)(p, m, DIMS), params),
        "v15": (lambda p, m: _make_encoder(_attend_onepass_512, False)(p, m, DIMS), params),
    }
    if "v16" in args.variants or "v17" in args.variants:
        from whisperkit_tpu.ops.quant import quantize_whisper_params

        qparams = quantize_whisper_params(params, bits=8)
        # r11: int8×int8 W8A8 block linears (probe_int8_matmul: ~1.3× MXU)
        variants["v16"] = (lambda p, m: encoder_v16(p, m, DIMS), qparams)
        # W8A16 encoder for reference (dequant-into-matmul, compute-bound
        # here so expected ≈ v0)
        variants["v17"] = (lambda p, m: _make_encoder(_attend_bf16, False)(p, m, DIMS), qparams)
    print(f"b={B} {DIMS.n_audio_layer}L d{DIMS.n_audio_state}  FLOPs/window batch: {FLOPS/1e12:.1f} TF", flush=True)
    for name in args.variants.split(","):
        fn, p = variants[name]
        try:
            measure(fn, p, mel, name)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
