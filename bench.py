"""Benchmark: end-to-end WhisperPipeline RTF on the available device.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "secondary"}.

Headline (BASELINE.md): real-time factor of the REAL pipeline —
`WhisperPipeline.transcribe` with VAD chunking, timestamp rules on, and the
full 224-token window budget over ≥10 minutes of audio (VERDICT r1 #2).
RTF = fullPipeline / inputAudioSeconds (Models.swift:770-772, lower is
better); vs_baseline compares against the 0.01 north-star target.

No network access → random-init weights. Random logits essentially never
sample EOT, so every window decodes its full token budget — this measures
the pipeline at ~3× the decode work of real speech (~50-80 tokens/window),
i.e. the headline is a PESSIMISTIC bound on real-audio RTF. The
`micro_rtf_32tok` secondary is the round-1 32-token microbench for
continuity. Quality-triggered fallback re-decodes are disabled (random
text would trip the compression-ratio ladder on every window, which real
speech does not).

Model: Whisper large-v3 (the north-star model) on TPU in the blessed
serving config (ComputeOptions.serving(): fused per-layer int8 cross-KV,
32-window groups — the config that fits and wins on one 16 GB v5e), with
bf16 b=16 (r2/r3 continuity), W8A16+int8-KV, and turbo as secondaries;
`tiny` + 1 minute on CPU (so the script stays runnable anywhere).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def synth_speechlike_audio(seconds: float, seed: int = 0) -> np.ndarray:
    """Speech-shaped test signal: 2-8 s modulated noise bursts separated by
    0.2-0.8 s of near-silence, so EnergyVAD finds real chunk boundaries."""
    rng = np.random.default_rng(seed)
    sr = 16_000
    total = int(seconds * sr)
    out = np.zeros(total, np.float32)
    t = 0
    while t < total:
        burst = int(rng.uniform(2.0, 8.0) * sr)
        gap = int(rng.uniform(0.2, 0.8) * sr)
        n = min(burst, total - t)
        if n > 0:
            x = rng.standard_normal(n).astype(np.float32)
            # crude spectral shaping + syllabic amplitude modulation
            env = 0.25 * (0.6 + 0.4 * np.sin(2 * np.pi * 4.0 * np.arange(n) / sr))
            out[t : t + n] = np.cumsum(x) / 50.0 * env  # brownish noise
        t += n + gap
    peak = np.abs(out).max() or 1.0
    out = (out / peak * 0.5).astype(np.float32)
    # land on the 16-bit PCM grid like every real audio source (WAV/FFmpeg
    # decode is int16-quantized): the pipeline ships grid-exact audio as
    # int16 over the tunnel (pipelines/whisper._upload_audio, bit-lossless,
    # half the upload bytes) and the bench should measure that path
    return (np.rint(out * 32768.0).clip(-32768, 32767) / np.float32(32768.0)).astype(np.float32)


def pipeline_options(group: int):
    """THE headline decode options (VAD chunking, rules on, full 224-token
    budget, fallback ladder off for random-init honesty). Module-scope so
    probes (tools/probe_pipeline_config.py) measure under the exact same
    recipe as the bench headline — a hand-copied block would silently
    diverge when this changes."""
    from whisperkit_tpu.core.configurations import DecodingOptions

    return DecodingOptions(
        language="en",
        chunking_strategy="vad",
        sample_length=224,
        without_timestamps=False,  # timestamp-rules filter ON
        # random-init text always trips quality thresholds; disable the
        # fallback ladder so the bench measures one honest decode per
        # window
        temperature_fallback_count=0,
        logprob_threshold=None,
        compression_ratio_threshold=None,
        no_speech_threshold=None,
        # random-init first-token logprob (~ -10) would trip the -1.5
        # floor and end every window at one token; disable so windows
        # decode the full budget
        first_token_log_prob_threshold=None,
        concurrent_worker_count=group,
    )


def window_converged(values: list, want: int, tol: float = 0.10) -> bool:
    """True when the last `want` entries agree within `tol` relative
    spread — the steady-state acceptance rule shared by the headline
    pass loop and `timed_converged`: timing continues (bounded) until
    the last N consecutive measurements converge, then the WORST of
    them reports. Never best-of-N: a real regression slows every pass
    and still reports in full; only non-repeatable one-off transients
    (the ~1-in-24 mid-pass transport stall, BENCHMARKS "Headline
    stability") stop deciding the number."""
    if len(values) < want:
        return False
    last = values[-want:]
    return max(last) / min(last) - 1.0 < tol


def timed_converged(fn, want: int = 2, max_extra: int = 3) -> float:
    """WORST of the last `want` consecutive timed calls of `fn(i)` that
    agree within 10% (`window_converged`), bounded by `max_extra` extra
    calls — the secondaries' version of the headline's steady-state
    worst-of-N rule."""
    walls: list = []
    for i in range(want + max_extra):
        t0 = time.perf_counter()
        fn(i)
        walls.append(time.perf_counter() - t0)
        if window_converged(walls, want):
            break
    return max(walls[-want:])


def measure_tunnel_dispatch_ms() -> float:
    """Median host→chip dispatch RTT (CLAUDE.md: drifts 5-35 ms across
    sessions and inflates every host-driven pipeline number — record it
    with any RTF you intend to believe)."""
    import jax
    import jax.numpy as jnp

    probe = jax.jit(lambda a: a.sum())
    np.asarray(probe(jnp.ones((8, 8))))
    rtts = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(probe(jnp.ones((8, 8))))
        rtts.append(time.perf_counter() - t0)
    return round(float(np.median(rtts)) * 1e3, 1)


def main() -> None:
    # Fail over BEFORE touching jax: backend init has no timeout, and with
    # the TPU tunnel down (multi-hour outages observed, CLAUDE.md) the
    # first jax call hangs ~15 min then raises — the driver's round-end
    # bench run would record nothing. Probe in a throwaway subprocess and
    # fall back to the CPU path so a JSON line always lands.
    import os

    # probe unless EXPLICITLY cpu: the axon backend registers via
    # sitecustomize/PYTHONPATH even when JAX_PLATFORMS is unset, so an
    # empty var is not safe (review finding r6)
    if os.environ.get("JAX_PLATFORMS", "") != "cpu":
        from whisperkit_tpu.core.device_probe import probe_backend

        res = probe_backend(timeout_s=120.0)
        if not res.ok:
            print(f"bench: {res.message}; falling back to CPU", file=sys.stderr)
            import jax

            jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp

    from whisperkit_tpu.core.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    from whisperkit_tpu.decoding.loop import DecodeScalars, decode_loop, encode_window
    from whisperkit_tpu.models.whisper import VARIANT_DIMS, init_params
    from whisperkit_tpu.pipelines.whisper import WhisperPipeline
    from whisperkit_tpu.text.tokenizer import special_tokens_for_vocab

    dev = jax.devices()[0]
    on_tpu = dev.platform != "cpu"

    # Condition probe: the chip is behind a network tunnel whose dispatch
    # RTT varies ~5-35 ms across sessions and inflates every host-driven
    # pipeline number (on-graph compute — the micro secondary — is
    # unaffected). Recording it makes each run's numbers interpretable.
    tunnel_dispatch_ms = measure_tunnel_dispatch_ms()
    # transport warmup: the first large transfer after idle can stall for
    # minutes (r4: one 29 MB upload took 310 s, subsequent ones 0.8 s);
    # push one untimed audio-sized upload so timed runs see a warm path
    if on_tpu:
        np.asarray(jnp.asarray(np.zeros(8_000_000, np.float32))[:4])
    # headline: the NORTH-STAR model — full large-v3 (32-layer decoder),
    # not turbo (VERDICT r2 #2); turbo runs as the continuity secondary
    variant = "large-v3" if on_tpu else "tiny"
    audio_minutes = 12.0 if on_tpu else 1.0
    audio = synth_speechlike_audio(audio_minutes * 60.0)

    def run_pipeline(
        variant_name: str, group: int, int8_kv: bool = False, w8a16: bool = False,
        w4a16: bool = False, passes: int | None = None, stabilize: bool = False,
        audio_arr: np.ndarray | None = None,
    ):
        """→ (rtf, pass_detail, n_segments, decode_loops, windows, ttft_s);
        frees the
        pipeline's device buffers before returning so runs don't contend
        for HBM. rtf is the WORST of the last `passes` CONSECUTIVE
        CONVERGED timed passes (all passes recorded) — worst-of-N over a
        measurement that is itself required to be in steady state.

        On TPU every config warms to STEADY STATE (up to 5 warmup passes,
        until two consecutive agree within 5%) before timing. Two
        diagnosed failure modes, both closed (tools/probe_headline_passes
        + the r5 24-pass stage-attribution probe, docs/BENCHMARKS.md
        "Headline stability"):
        1. monotone pass decay after the compile-heavy warmup
           (0.00897→0.00634 over 6 passes) — fixed by the steady-state
           warmup above;
        2. RARE MID-PASS TRANSPORT STALLS (~1 pass in 24: +0.9-3.7 s
           landing entirely in the decode-pull bucket while per-pass RTT
           and load stay flat) — a one-off tunnel/device transient, not a
           code path. Fixed by the convergence rule below, NOT by
           best-of-N: timing continues (bounded extra passes) until the
           last `passes` consecutive passes agree within 10%, and the
           reported value is the WORST of those. A real regression slows
           every pass and still reports; only non-repeatable one-off
           events stop sinking the number, and they stay visible in the
           recorded pass list.
        stabilize=True additionally records per-pass attribution markers
        (RTT before/after, load1m, pipeline stage buckets) — the
        headline's forensic trail."""
        from whisperkit_tpu.core.configurations import ComputeOptions, WhisperConfig

        dims_v = VARIANT_DIMS[variant_name]
        params_v = init_params(jax.random.PRNGKey(0), dims_v)
        if w8a16 or w4a16:  # the reference ships quantized variants first-class
            from whisperkit_tpu.ops.quant import quantize_whisper_params

            params_v = quantize_whisper_params(params_v, bits=4 if w4a16 else 8)
        pipe = WhisperPipeline(
            WhisperConfig(
                compute_options=(
                    ComputeOptions.serving() if int8_kv else ComputeOptions()
                )
            ),
            dims=dims_v, params=params_v,
        )
        options = pipeline_options(group)
        run_audio = audio if audio_arr is None else audio_arr
        audio_s = len(run_audio) / 16_000
        # warmup/compile on the FULL audio: the chunk-bucket group clamp
        # means a 60 s warmup only compiles small-group shapes, leaving the
        # first timed pass to pay the 20-120 s remote b=32 compiles on a
        # cold cache (r5 review finding)
        # warm to STEADY STATE for every on-TPU config, not just the
        # headline: the diagnosed monotone pass decay (see stabilize note)
        # hit the single-warmup secondaries in the r5 validation run —
        # w8a16 recorded 0.01521 (expected ~0.006) and bf16 0.01203 purely
        # from warmup residue landing in the 2 timed passes
        warmup_rtfs = []
        max_warmups = 5 if on_tpu else 1
        for i in range(max_warmups):
            t0 = time.perf_counter()
            pipe.transcribe(run_audio, options)
            warmup_rtfs.append(round((time.perf_counter() - t0) / audio_s, 5))
            if (
                i >= 1
                and abs(warmup_rtfs[-1] - warmup_rtfs[-2]) / warmup_rtfs[-2]
                < 0.05
            ):
                break
        pass_detail = []
        import os as _os

        want = passes if passes is not None else (3 if on_tpu else 1)
        # bounded extra passes to re-establish steady state after a one-off
        # mid-pass transport stall (see docstring); off-TPU there is no
        # transport, so no extras
        max_passes = want + 5 if on_tpu else want
        while True:
            rtt_before = measure_tunnel_dispatch_ms() if stabilize else None
            t0 = time.perf_counter()
            result = pipe.transcribe(run_audio, options)
            rtf_i = (time.perf_counter() - t0) / audio_s
            d = {"rtf": round(rtf_i, 5)}
            if stabilize:  # per-pass attribution markers (VERDICT r4 #1a)
                d["rtt_ms_before"] = rtt_before
                d["rtt_ms_after"] = measure_tunnel_dispatch_ms()
                d["load1m"] = round(_os.getloadavg()[0], 2)
                t = pipe.timings  # stage buckets: a stall localizes here
                d["stage_s"] = {
                    "mels": round(t.log_mels, 2),
                    "encode": round(t.encoding, 2),
                    "decode": round(t.decoding_loop, 2),
                }
            pass_detail.append(d)
            if len(pass_detail) >= max_passes:
                break
            if window_converged([p["rtf"] for p in pass_detail], want):
                break
        counted = [p["rtf"] for p in pass_detail[-want:]]
        converged = len(counted) < 2 or window_converged(counted, len(counted))
        stats = (
            max(counted),
            {
                "passes": pass_detail,
                "counted": counted,
                "converged": converged,
                "warmup_rtfs": warmup_rtfs,
            },
            len(result.segments),
            int(pipe.timings.total_decoding_loops),
            int(pipe.timings.total_decoding_windows),
            # last timed pass's time-to-first-token (Models.swift:483):
            # mel+encode+first batched decode of the first VAD group
            round(pipe.timings.time_to_first_token, 3),
        )
        pipe.params = None  # drop the device buffers (3 GB for large-v3)
        del pipe, result
        return stats

    # ---- headline: real pipeline, VAD-chunked, rules on, 224-token budget --
    # The headline CONFIG is the blessed serving preset
    # (ComputeOptions.serving(): int8 cross-KV fused per-layer into encode,
    # plus W8A16 weights as of r5 — see the promotion note below)
    # at 32-window groups: the fused project+quantize keeps peak HBM at
    # ~2 GB int8 + one bf16 layer, so large-v3 b=32 — which measures 20%
    # better per decode row (0.52 vs 0.65 ms/row/step, tools/
    # perf_decode.py) — fits one 16 GB v5e. bf16 at 16-window groups stays
    # a secondary for r2/r3 continuity (b=32 bf16 cannot fit: 7.9 GB
    # cross-KV alone).
    # Headline = WORST of the last three CONSECUTIVE CONVERGED timed
    # passes (all recorded, with per-pass RTT/load/stage markers) after
    # STABILIZED warmup: worst-of-3 acceptance (VERDICT r3 weak #3) over a
    # measurement required to be in steady state (VERDICT r4 #1 — warmup
    # decay AND rare one-off mid-pass transport stalls both diagnosed; see
    # run_pipeline's stabilize note). Cross-session transport condition
    # rides along as tunnel_dispatch_ms + degraded_tunnel.
    # r5 headline promotion: W8A16 weights JOIN the serving preset's int8
    # cross-KV — measured best large-v3 config every time it ran (probe
    # 0.00591/0.00617; r5 bench secondary 0.00616 vs 0.00672 bf16-weights)
    # and quality-equivalent on the offline evidence (teacher-forced ZERO
    # flips, same free-run band as the cross-KV-only preset — BENCHMARKS
    # "Quantization quality"). The reference benchmarks quantized variants
    # first-class (fastlane/Fastfile:26-55, 626/594/947/954 MB models).
    # The bf16-weights serving config stays a tracked secondary below.
    rtf, headline_detail, n_segments, decode_loops, n_windows, ttft_s = run_pipeline(
        variant, 32 if on_tpu else 4, int8_kv=on_tpu, w8a16=on_tpu,
        stabilize=True,
    )
    pipeline_s = rtf * len(audio) / 16_000
    dims = VARIANT_DIMS["large-v3-turbo" if on_tpu else "tiny"]
    sp = special_tokens_for_vocab(dims.n_vocab)
    params = init_params(jax.random.PRNGKey(0), dims)

    # ---- secondaries: bf16 b=16 + bf16-weights serving + W4A16 + turbo -----
    turbo_rtf = bf16_rtf = quant_rtf = w4_rtf = None
    if on_tpu:
        # secondaries: 2 timed passes each (worst-of-2) to bound the
        # round-end bench wall time; the headline gets the full 3
        bf16_rtf, _, _, _, _, _ = run_pipeline(variant, 16, passes=2)
        # bf16-weights + int8 cross-KV at b=32: the r2-r5 headline config,
        # kept as a continuity secondary now that W8A16 weights are in the
        # headline preset (see headline note above)
        quant_rtf, _, _, _, _, _ = run_pipeline(
            variant, 32, int8_kv=True, passes=2
        )
        try:
            # W4A16 (r6, 4-bit palettized-variant analog): measured slower
            # than W8A16 (0.01052 vs 0.00662, BENCHMARKS "W4A16") — kept as
            # a tracked secondary; guarded so a compile/OOM surprise cannot
            # take down the headline output
            w4_rtf, _, _, _, _, _ = run_pipeline(
                variant, 32, int8_kv=True, w4a16=True, passes=2
            )
        except Exception:
            import traceback

            # keep the one-JSON-line stdout contract; preserve the diagnosis
            print("w4a16 secondary failed:", file=sys.stderr)
            traceback.print_exc()
            w4_rtf = None
        turbo_rtf, _, _, _, _, _ = run_pipeline("large-v3-turbo", 32, passes=2)

    # ---- secondary: hour-scale long-form (VERDICT r4 #6) --------------------
    # 60 min through the serving preset: ~120 VAD chunks = 4 full b=32
    # groups, the multi-group steady state the 12-min headline (~1 group)
    # never reaches. Group shapes are identical to the headline's, so this
    # costs passes, not compiles. Guarded: a failure here cannot take down
    # the one-JSON-line output.
    long60_rtf = None
    if on_tpu:
        try:
            audio60 = synth_speechlike_audio(3600.0, seed=11)
            long60_rtf, _, _, _, _, _ = run_pipeline(
                variant, 32, int8_kv=True, w8a16=True, passes=2,
                audio_arr=audio60,
            )
            del audio60
        except Exception:
            import traceback

            print("60min long-form secondary failed:", file=sys.stderr)
            traceback.print_exc()

    # ---- secondary: serving under concurrent load (VERDICT r2 #2) ----------
    # 32 simultaneous 30 s requests through BatchScheduler on the blessed
    # serving preset — the deployment story the OpenAI server sits on.
    serving_stats = None
    if on_tpu:
        from whisperkit_tpu.core.configurations import ComputeOptions, WhisperConfig
        from whisperkit_tpu.pipelines.scheduler import BatchScheduler

        dims_v = VARIANT_DIMS[variant]
        pipe = WhisperPipeline(
            WhisperConfig(compute_options=ComputeOptions.serving()),
            dims=dims_v, params=init_params(jax.random.PRNGKey(0), dims_v),
        )
        sched = BatchScheduler(pipe, max_batch=32, max_wait_ms=500.0)
        clip30 = synth_speechlike_audio(30.0, seed=3)
        options = pipeline_options(32)
        for f in [sched.submit(clip30, options) for _ in range(32)]:
            f.result(timeout=3600)  # warmup batch (compile)
        from whisperkit_tpu.eval.loadgen import poisson_gaps, run_load

        burst = run_load(sched, pipe, [clip30] * 32, options)
        wall = burst["wall_s"]
        serving_stats = {
            k: burst[k]
            for k in ("p50_s", "p99_s", "agg_tokens_per_s", "mean_batch_fill")
        }
        # staggered scenario (VERDICT r3 #4): Poisson arrivals at ~1× the
        # burst capacity just measured — bursts complete together and hide
        # queueing; staggered p50/p95/p99 shows latency under partial load.
        # Shared harness with tools/perf_serve.py (eval/loadgen.py) so the
        # two can't drift; full sweep incl. 0.5×/2× and mixed durations
        # lives in perf_serve.
        cap_rps = 32.0 / wall  # requests/s of 30 s clips
        # bucket-ladder warmup: Poisson arrivals form PARTIAL batches that
        # the scheduler pads to power-of-two buckets (1/2/4/8/16) — each a
        # fresh encode+decode compile on a cold cache (20-120 s over the
        # relay) that would otherwise land INSIDE the timed staggered run
        # (same reason tools/perf_serve.py warms every bucket)
        for k in (1, 2, 4, 8, 16):
            for f in [sched.submit(clip30, options) for _ in range(k)]:
                f.result(timeout=3600)
        stag = run_load(
            sched, pipe, [clip30] * 16, options,
            arrival_gaps=poisson_gaps(
                np.random.default_rng(7), cap_rps, 16
            ),
        )
        serving_stats["staggered16_poisson_1x"] = {
            "arrival_rps": round(cap_rps, 2),
            **{k: stag[k] for k in (
                "wall_s", "p50_s", "p95_s", "p99_s", "agg_tokens_per_s",
            )},
        }
        sched.shutdown()
        pipe.params = None
        del pipe, sched

    # ---- secondaries: TTS + diarization (VERDICT r4 #2) ---------------------
    # Both kits carry driver-captured round-over-round numbers in their
    # blessed configs (reference stamps both: Qwen3GenerateTask.swift:186-193,
    # PyannoteConfig.swift:150-210). Guarded so a surprise cannot take down
    # the one-JSON-line headline output.
    tts_ms_per_frame = diarize_s = None

    if on_tpu:
        try:
            # blessed TTS config (docs/BENCHMARKS.md): 0.6b W8A16, b=4,
            # unrolled T==1 code predictor — AR ms/frame, worst-of-2
            from whisperkit_tpu.decoding.tts_loop import TTSScalars, tts_generate_loop
            from whisperkit_tpu.models.qwen3_tts import init_tts_params
            from whisperkit_tpu.ops.quant import quantize_tts_params
            from whisperkit_tpu.pipelines.tts import TTS_VARIANTS

            tts_dims = TTS_VARIANTS["0.6b"]
            tts_params = quantize_tts_params(
                init_tts_params(jax.random.PRNGKey(0), tts_dims), bits=8
            )
            tts_frames = 64
            embeds = (
                jax.random.normal(jax.random.PRNGKey(1), (4, 24, tts_dims.d_model))
                * 0.02
            ).astype(jnp.bfloat16)

            def tts_gen(seed: int):
                out = tts_generate_loop(
                    tts_params, embeds,
                    TTSScalars(
                        temperature=jnp.float32(0.9),
                        repetition_penalty=jnp.float32(1.05),
                        rng_key=jax.random.PRNGKey(seed),
                    ),
                    dims=tts_dims, max_new_tokens=tts_frames, top_k=50,
                )
                return np.asarray(out.codes)

            # warm to steady state like the pipeline configs (monotone
            # pass decay, run_pipeline note), then worst-of-2
            warm = []
            for i in range(4):
                t0 = time.perf_counter()
                tts_gen(i)
                warm.append(time.perf_counter() - t0)
                if i >= 1 and abs(warm[-1] - warm[-2]) / warm[-2] < 0.05:
                    break
            tts_ms_per_frame = round(
                timed_converged(lambda i: tts_gen(10 + i)) * 1000 / tts_frames,
                3,
            )
            del tts_params, embeds
        except Exception:
            import traceback

            print("tts secondary failed:", file=sys.stderr)
            traceback.print_exc()
        try:
            # blessed diarization config (docs/BENCHMARKS.md): fast conv
            # pair (random-init default), 10 min audio — seconds, worst-of-2
            from whisperkit_tpu.pipelines.diarize import (
                DiarizationOptions,
                DiarizePipeline,
            )

            dpipe = DiarizePipeline()
            d_audio = synth_speechlike_audio(10 * 60.0, seed=5)
            d_opts = DiarizationOptions()
            # warm to steady state (monotone pass decay, run_pipeline note)
            warm = []
            for i in range(4):
                t0 = time.perf_counter()
                dpipe.diarize(d_audio, d_opts)
                warm.append(time.perf_counter() - t0)
                if i >= 1 and abs(warm[-1] - warm[-2]) / warm[-2] < 0.05:
                    break
            diarize_s = round(
                timed_converged(lambda i: dpipe.diarize(d_audio, d_opts)), 2
            )
            del dpipe, d_audio
        except Exception:
            import traceback

            print("diarize secondary failed:", file=sys.stderr)
            traceback.print_exc()

    # ---- secondary: round-1 32-token microbench (continuity) ---------------
    batch = 64 if on_tpu else 2
    mel_in = jax.random.normal(jax.random.PRNGKey(1), (batch, 480_000)) * 0.1
    prompt = jnp.asarray([[sp.sot, sp.transcribe]] * batch, jnp.int32)
    suppress = jnp.zeros((dims.n_vocab,), jnp.float32)

    from whisperkit_tpu.ops.mel import log_mel_spectrogram

    def run_micro(seed: int):
        mel = log_mel_spectrogram(mel_in, n_mels=dims.n_mels)
        _, ck, cv = encode_window(params, mel, dims)
        scalars = DecodeScalars(
            temperature=jnp.float32(0.0),
            max_initial_timestamp_index=jnp.int32(50),
            first_token_logprob_threshold=jnp.float32(float("-inf")),
            rng_key=jax.random.PRNGKey(seed),
        )
        out = decode_loop(
            params, ck, cv, prompt, suppress, scalars,
            dims=dims, special=sp, sample_begin=2, max_new_tokens=32,
            top_k=5, sot_index=0, use_timestamp_rules=False,
            suppress_blank=False,
        )
        return np.asarray(out.tokens)

    run_micro(0)  # compile
    t0 = time.perf_counter()
    n_iter = 3
    for i in range(n_iter):
        run_micro(i + 1)
    micro_rtf = (time.perf_counter() - t0) / n_iter / (batch * 30.0)

    baseline_rtf = 0.01  # BASELINE.md north-star target
    tunnel_dispatch_ms_end = measure_tunnel_dispatch_ms()
    secondary = {
        "tunnel_dispatch_ms": tunnel_dispatch_ms,
        "tunnel_dispatch_ms_end": tunnel_dispatch_ms_end,
        # mechanical round-over-round comparability marker: a session whose
        # dispatch RTT exceeds ~20 ms inflates host-driven pipeline numbers
        # up to ~2× (CLAUDE.md); on-graph micro numbers are immune
        "degraded_tunnel": bool(
            on_tpu
            and max(tunnel_dispatch_ms, tunnel_dispatch_ms_end) > 20.0
        ),
        "headline_runs": [p["rtf"] for p in headline_detail["passes"]],
        "headline_counted": headline_detail["counted"],
        "headline_converged": headline_detail["converged"],
        "headline_passes": headline_detail["passes"],
        "headline_warmup_rtfs": headline_detail["warmup_rtfs"],
        f"micro_rtf_32tok_b{batch}": round(micro_rtf, 5),
        "segments": n_segments,
        "time_to_first_token_s": ttft_s,
        "tokens_per_second": round(decode_loops / pipeline_s, 1),
        "windows": n_windows,
    }
    if serving_stats is not None:
        secondary["serving_burst32x30s"] = serving_stats
    if tts_ms_per_frame is not None:
        secondary["tts_ms_per_frame_0.6b_w8a16_b4"] = tts_ms_per_frame
    if diarize_s is not None:
        secondary["diarize_s_per_10min"] = diarize_s
    if long60_rtf is not None:
        secondary["pipeline_rtf_large-v3_serving_w8a16_vad_60min"] = round(
            long60_rtf, 5
        )
    if turbo_rtf is not None:
        secondary[f"pipeline_rtf_large-v3-turbo_vad_{int(audio_minutes)}min"] = round(
            turbo_rtf, 5
        )
    if bf16_rtf is not None:
        secondary[f"pipeline_rtf_{variant}_bf16_b16_vad_{int(audio_minutes)}min"] = round(
            bf16_rtf, 5
        )
    if quant_rtf is not None:
        # the r2-r5 headline config's name, unchanged, for round-over-round
        # continuity (it is now the bf16-weights serving secondary)
        secondary[f"pipeline_rtf_{variant}_serving_int8kv_b32_vad_{int(audio_minutes)}min"] = round(
            quant_rtf, 5
        )
    if w4_rtf is not None:
        secondary[f"pipeline_rtf_{variant}_w4a16_int8kv_vad_{int(audio_minutes)}min"] = round(
            w4_rtf, 5
        )
    metric = (
        f"pipeline_rtf_{variant}_serving_w8a16_int8kv_b32_vad_{int(audio_minutes)}min"
        if on_tpu
        else f"pipeline_rtf_{variant}_vad_{int(audio_minutes)}min"
    )
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(rtf, 5),
                "unit": "rtf (pipeline_s / audio_s, lower is better)",
                "vs_baseline": round(baseline_rtf / rtf, 2),
                "secondary": secondary,
            }
        )
    )


if __name__ == "__main__":
    main()
