"""Ablate the decode step to locate the per-step cost (b=32 turbo).

A: decoder_forward alone (fixed token, kv carried)
B: A + argmax feeds next token
C: B + f32 logits materialization patterns of the real loop
Run: python tools/perf_decode_ablate.py
"""
import sys, time
sys.path.insert(0, ".")
import jax, jax.numpy as jnp, numpy as np
from whisperkit_tpu.core.compile_cache import enable_compilation_cache
from whisperkit_tpu.models.whisper import VARIANT_DIMS, decoder_forward, init_params
from whisperkit_tpu.decoding.loop import encode_window
from whisperkit_tpu.text.tokenizer import special_tokens_for_vocab

enable_compilation_cache()
dims = VARIANT_DIMS["large-v3-turbo"]; sp = special_tokens_for_vocab(dims.n_vocab)
params = init_params(jax.random.PRNGKey(0), dims)
B, TOTAL, STEPS = 32, 226, 48
mel = jax.random.normal(jax.random.PRNGKey(1), (B, dims.n_mels, 3000)) * 0.1
_, ck, cv = encode_window(params, mel, dims)
kv_shape = (dims.n_text_layer, B, dims.n_text_head, TOTAL, dims.head_dim)

def run(fn, label):
    jf = jax.jit(fn)
    out = jf(); _ = np.asarray(jnp.mean(out))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); out = jf(); _ = np.asarray(jnp.mean(out)); ts.append(time.perf_counter()-t0)
    print(f"{label}: {np.median(ts)*1e3/STEPS:.2f} ms/step", flush=True)

def variant_a():
    kv = (jnp.zeros(kv_shape, jnp.bfloat16), jnp.zeros(kv_shape, jnp.bfloat16))
    tok = jnp.full((B, 1), 5, jnp.int32)
    def body(carry, pos):
        kv_k, kv_v, acc = carry
        logits, (kv_k, kv_v), _ = decoder_forward(params, tok, pos, kv_k, kv_v, ck, cv, dims)
        return (kv_k, kv_v, acc + logits[:, -1, 0]), None
    (k, v, acc), _ = jax.lax.scan(body, (kv[0], kv[1], jnp.zeros((B,))), jnp.arange(STEPS))
    return acc

def variant_b():
    kv = (jnp.zeros(kv_shape, jnp.bfloat16), jnp.zeros(kv_shape, jnp.bfloat16))
    tok0 = jnp.full((B,), 5, jnp.int32)
    def body(carry, pos):
        kv_k, kv_v, tok = carry
        logits, (kv_k, kv_v), _ = decoder_forward(params, tok[:, None], pos, kv_k, kv_v, ck, cv, dims)
        return (kv_k, kv_v, jnp.argmax(logits[:, -1], -1).astype(jnp.int32)), None
    (k, v, tok), _ = jax.lax.scan(body, (kv[0], kv[1], tok0), jnp.arange(STEPS))
    return tok

def variant_c():
    # + token buffer DUS + logprob logsumexp like the real loop
    kv = (jnp.zeros(kv_shape, jnp.bfloat16), jnp.zeros(kv_shape, jnp.bfloat16))
    tokens = jnp.full((B, TOTAL), sp.eot, jnp.int32)
    def body(carry, pos):
        kv_k, kv_v, tokens, tok = carry
        logits, (kv_k, kv_v), _ = decoder_forward(params, tok[:, None], pos, kv_k, kv_v, ck, cv, dims)
        l = logits[:, -1]
        tok = jnp.argmax(l, -1).astype(jnp.int32)
        lp = jnp.take_along_axis(l, tok[:, None], 1)[:, 0] - jax.scipy.special.logsumexp(l, -1)
        tokens = jax.lax.dynamic_update_slice(tokens, tok[:, None], (0, pos))
        return (kv_k, kv_v, tokens, tok + (lp > -1e9).astype(jnp.int32) * 0), None
    (k, v, tokens, tok), _ = jax.lax.scan(body, (kv[0], kv[1], tokens, jnp.full((B,), 5, jnp.int32)), jnp.arange(STEPS))
    return tok

run(variant_a, "A decoder_forward only")
run(variant_b, "B + argmax feedback")
run(variant_c, "C + buffer/logprob")
