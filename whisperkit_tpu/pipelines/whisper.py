"""WhisperPipeline — the transcription façade + per-window transcribe engine.

Reference: Sources/WhisperKit/Core/WhisperKit.swift (façade, :56-1019) and
TranscribeTask.swift (seek-window loop + temperature fallback, :57-411).

TPU-native differences from the reference (SURVEY.md §2.6):
  * the reference fans VAD chunks out to a TaskGroup of batch-of-1 decodes;
    here chunks are STACKED into a real batch dimension and decoded by one
    jitted `lax.while_loop` with per-row done masks;
  * the reference pays one host↔ANE round trip per token; here the whole
    token loop runs on-device (decoding/loop.py);
  * the temperature-fallback ladder re-invokes the same compiled decode fn
    with a different traced temperature scalar — no recompile.
"""

from __future__ import annotations

import dataclasses
import math
import time
from pathlib import Path
from typing import Callable, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from whisperkit_tpu.audio.chunker import VADAudioChunker
from whisperkit_tpu.audio.io import SAMPLE_RATE, load_audio, pad_or_trim
from whisperkit_tpu.core.configurations import (
    ChunkingStrategy,
    DecodingOptions,
    DecodingTask,
    WhisperConfig,
)
from whisperkit_tpu.core.errors import ModelsUnavailable
from whisperkit_tpu.core.logging import logging
from whisperkit_tpu.core.modelstate import ModelState
from whisperkit_tpu.core.results import (
    DecodingFallback,
    TranscriptionProgress,
    TranscriptionResult,
    TranscriptionSegment,
)
from whisperkit_tpu.core.timings import TranscriptionTimings
from whisperkit_tpu.decoding.filters import non_speech_token_ids, suppress_tokens_bias
from whisperkit_tpu.decoding.loop import (
    DecodeScalars,
    decode_loop,
    detect_language_logits,
    encode_window,
)
from whisperkit_tpu.models.whisper import WhisperDims
from whisperkit_tpu.ops.mel import log_mel_spectrogram
from whisperkit_tpu.text.languages import LANGUAGES
from whisperkit_tpu.text.segment_seeker import (
    FRAMES_PER_SECOND,
    WINDOW_FRAMES,
    find_seek_point_and_segments,
)
from whisperkit_tpu.text.tokenizer import FakeTokenizer, load_tokenizer
from whisperkit_tpu.text.utils import compression_ratio_text

WINDOW_SAMPLES = 480_000  # Constants.windowSamples (Models.swift:1457)
MAX_TOKEN_CONTEXT = 224  # Constants.maxTokenContext (Models.swift:1334)
_WINDOW_PADDING_FRAMES = 100  # skip trailing windows shorter than 1 s


@dataclasses.dataclass
class _WindowDecode:
    """Per-window decode outcome after the fallback ladder."""

    tokens: list[int]
    logprobs: list[float]
    avg_logprob: float
    compression_ratio: float
    no_speech_prob: float
    temperature: float
    language: str
    alignment: Optional[np.ndarray] = None  # [T, A, 1500] (prompt+sampled)
    sample_begin: int = 0


class _MelStore:
    """Mel windows kept in the [≤32, n_mels, 3000] sub-batch device arrays
    they were computed in.

    `take(ids)` assembles arbitrary window rows into ONE batch array using
    one gather per source sub-batch + one concat + one reorder gather —
    instead of one relay dispatch per window (the old per-row slice +
    restack pattern): over the remote-device transport every dispatch
    costs ~10-15 ms of host work even when asynchronous (measured r12),
    so 32 slices + a stack burned ~0.4 s of the 12-min headline wall."""

    def __init__(self, batches: list):
        self.batches = batches
        self.sizes = [int(b.shape[0]) for b in batches]
        self.offsets = np.concatenate([[0], np.cumsum(self.sizes)])
        self.n = int(self.offsets[-1])

    def take(self, ids, pad_to: Optional[int] = None, pad_row=None):
        """Rows `ids` (global window indices, any order) as one
        [pad_to or len(ids), n_mels, 3000] array; pad rows (broadcast
        `pad_row` [n_mels, 3000]) fill the tail when pad_to > len(ids)."""
        by_src: dict[int, list[tuple[int, int]]] = {}
        for out_i, gid in enumerate(ids):
            src = int(np.searchsorted(self.offsets, gid, side="right")) - 1
            by_src.setdefault(src, []).append((gid - int(self.offsets[src]), out_i))
        pieces = []
        perm = np.empty(len(ids), np.int32)
        pos = 0
        for src in sorted(by_src):
            rows = by_src[src]
            local = jnp.asarray([r for r, _ in rows], jnp.int32)
            pieces.append(jnp.take(self.batches[src], local, axis=0))
            for k, (_, out_i) in enumerate(rows):
                perm[out_i] = pos + k
            pos += len(rows)
        n_pad = (pad_to - len(ids)) if pad_to is not None else 0
        if n_pad > 0:
            pieces.append(
                jnp.broadcast_to(pad_row[None], (n_pad,) + pad_row.shape)
            )
            perm = np.concatenate([perm, np.arange(pos, pos + n_pad)]).astype(np.int32)
        out = pieces[0] if len(pieces) == 1 else jnp.concatenate(pieces, 0)
        if not np.array_equal(perm, np.arange(len(perm))):
            out = jnp.take(out, jnp.asarray(perm), axis=0)
        return out


class WhisperPipeline:
    """Reference: `WhisperKit` class (WhisperKit.swift)."""

    def __init__(
        self,
        config: Optional[WhisperConfig] = None,
        *,
        dims: Optional[WhisperDims] = None,
        params=None,
        tokenizer=None,
        alignment_heads: Optional[np.ndarray] = None,
        draft_dims: Optional[WhisperDims] = None,
        draft_params=None,
        **kwargs,
    ):
        from whisperkit_tpu.core.compile_cache import enable_compilation_cache

        enable_compilation_cache()
        self.config = config or WhisperConfig(**kwargs)
        self.model_state = ModelState.UNLOADED
        self.dims: Optional[WhisperDims] = dims
        self.params = params
        self.tokenizer = tokenizer
        self.alignment_heads = alignment_heads
        self.timings = TranscriptionTimings()
        self._suppress_cache: dict[tuple, jnp.ndarray] = {}
        self._detected_language: Optional[str] = None
        self._mesh_plan = None  # lazily built when >1 device is visible
        # speculative decoding (batch-1 latency mode): a small draft model
        # sharing the vocab (e.g. large-v3-turbo for large-v3) makes greedy
        # batch-1 decodes run the lossless draft-verify loop
        # (decoding/speculative.py)
        self.draft_dims = draft_dims
        self.draft_params = draft_params
        self._draft_kv = None  # (cross_k, cross_v) of the current window
        # optional cross-thread cancellation (core/concurrency.EarlyStopFlag
        # or anything with .should_stop). When set, greedy decodes run as
        # resumable ~32-token segments and the flag is polled between them —
        # the reference's mid-window TranscriptionCallback cancellation
        # (Models.swift:643-728) at segment granularity.
        self.early_stop_flag = None

        if params is not None and dims is not None:
            if tokenizer is None:
                self.tokenizer = FakeTokenizer(dims.n_vocab)
            self.model_state = ModelState.LOADED
        elif self.config.load:
            self.load_models()

    # -- lifecycle ----------------------------------------------------------

    def load_models(self) -> None:
        """Resolve + load checkpoint and tokenizer.

        Reference: WhisperKit.swift:358-442 `loadModels`.
        """
        from whisperkit_tpu.core.registry import resolve_model_folder
        from whisperkit_tpu.models.loader import load_whisper

        t0 = time.perf_counter()
        self.model_state = ModelState.LOADING
        model = self.config.model
        if model is None and self.config.model_folder is None:
            # pick the platform's recommended variant (reference:
            # recommendedRemoteModels, WhisperKit.swift:162-217)
            from whisperkit_tpu.core.model_support import recommended_model

            model = recommended_model()
            logging.info(f"no model specified; using recommended '{model}'")
        folder = resolve_model_folder(
            model=model,
            model_repo=self.config.model_repo,
            model_folder=self.config.model_folder,
            download=self.config.download,
        )
        # quantization rides the loader: a pre-quantized on-disk cache (the
        # reference's compressed-model-folder analog) short-circuits both
        # the safetensors parse and the quantize pass (models/loader.py)
        # ("w8a8" loads the same int8 tree as "w8a16" — the loader
        # normalizes it so both schemes share one on-disk quantized cache;
        # the A8 half is the pipeline's _act8 encoder dispatch)
        self.dims, self.params, heads = load_whisper(
            folder, quantization=self.config.compute_options.quantization
        )
        if self.alignment_heads is None:
            self.alignment_heads = heads
        try:
            self.tokenizer = load_tokenizer(
                folder, self.dims.n_vocab, self.config.tokenizer_folder
            )
        except FileNotFoundError:
            logging.error("tokenizer files missing; using FakeTokenizer")
            self.tokenizer = FakeTokenizer(self.dims.n_vocab)
        self.timings.model_loading = time.perf_counter() - t0
        self.model_state = ModelState.LOADED
        if self.config.prewarm:
            self.prewarm()

    def prewarm(self) -> None:
        """AOT-compile mel+encoder+decode for batch 1 (reference: prewarm
        specialization, WhisperKit.swift:392-427)."""
        self.model_state = ModelState.PREWARMING
        t0 = time.perf_counter()
        silent = np.zeros(WINDOW_SAMPLES, np.float32)
        self._transcribe_array(silent, DecodingOptions(sample_length=4))
        self.timings.encoder_specialization_time = time.perf_counter() - t0
        self.model_state = ModelState.LOADED

    def unload_models(self) -> None:
        self.params = None
        self.model_state = ModelState.UNLOADED

    @property
    def is_multilingual(self) -> bool:
        return self.dims.n_vocab != 51864 if self.dims else True

    @property
    def _act8(self) -> bool:
        """W8A8: int8-activation encoder matmuls (ComputeOptions
        quantization="w8a8" — int8 weights ride the w8a16 machinery)."""
        return self.config.compute_options.quantization == "w8a8"

    # -- helpers ------------------------------------------------------------

    def _suppress_bias(self, options: DecodingOptions) -> jnp.ndarray:
        sp = self.tokenizer.special
        ids = list(options.suppress_tokens or ())
        if -1 in ids:
            ids = [t for t in ids if t != -1] + non_speech_token_ids(sp, self.tokenizer)
        key = tuple(sorted(set(ids)))
        if key not in self._suppress_cache:
            self._suppress_cache[key] = jnp.asarray(
                suppress_tokens_bias(sp.n_vocab, key)
            )
        return self._suppress_cache[key]

    def _build_prompt(self, options: DecodingOptions, language: str) -> tuple[list[int], int]:
        """Prefill prompt tokens (reference: TextDecoder.swift:163-216).

        Returns (tokens, sot_index).
        """
        sp = self.tokenizer.special
        prompt: list[int] = []
        if options.prompt_tokens:
            keep = MAX_TOKEN_CONTEXT // 2 - 1
            prompt = [sp.startofprev] + list(options.prompt_tokens)[-keep:]
        sot_index = len(prompt)
        prompt.append(sp.sot)
        if self.is_multilingual and options.use_prefill_prompt:
            prompt.append(sp.language_token(language))
            prompt.append(
                sp.translate if options.task == DecodingTask.TRANSLATE else sp.transcribe
            )
        if options.without_timestamps:
            prompt.append(sp.notimestamps)
        if options.prefix_tokens:
            keep = MAX_TOKEN_CONTEXT // 2 - 1
            prompt.extend(list(options.prefix_tokens)[-keep:])
        return prompt, sot_index

    def _decode_scalars(self, options: DecodingOptions, temperature: float, seed_step: int) -> DecodeScalars:
        max_initial = (
            int(round(options.max_initial_timestamp / 0.02))
            if options.max_initial_timestamp is not None
            else 1500
        )
        ft = (
            options.first_token_log_prob_threshold
            if options.first_token_log_prob_threshold is not None and temperature == 0.0
            else float("-inf")
        )
        return DecodeScalars(
            temperature=jnp.float32(temperature),
            max_initial_timestamp_index=jnp.int32(max_initial),
            first_token_logprob_threshold=jnp.float32(ft),
            rng_key=jax.random.PRNGKey(options.seed + seed_step),
        )

    def _mel(self, window: np.ndarray) -> jnp.ndarray:
        return log_mel_spectrogram(jnp.asarray(window), n_mels=self.dims.n_mels)

    def _stage_sync(self, x) -> None:
        """With ComputeOptions.sync_timings, wait for `x` to finish so the
        surrounding stage stamp measures EXECUTION time, not dispatch time
        (reference logTimings semantics, Models.swift:478-539). Forces a
        one-scalar host pull — block_until_ready is unreliable over the
        axon tunnel (CLAUDE.md) and a scalar never stalls the transport.
        No-op (async dispatch, stamps ≈ 0) by default: each sync costs one
        host round trip, 5-40 ms over this tunnel."""
        if not self.config.compute_options.sync_timings:
            return
        leaf = jax.tree.leaves(x)[-1]
        np.asarray(jnp.ravel(leaf)[:1])

    def _mel_many(self, windows: list) -> list:
        """Mel for N ≤30 s windows in batched dispatches of ≤32 (ONE device
        round trip per sub-batch instead of one per window). Returns the
        list of [k≤32, n_mels, 3000] SUB-BATCH device arrays — callers that
        need one array concatenate once (`_mel_batch`); slicing out
        per-window rows costs one relay dispatch EACH (~10-15 ms of host
        work even async, measured r12) and is exactly what this layout
        avoids."""
        out: list = []
        for start in range(0, len(windows), 32):
            part = windows[start : start + 32]
            stacked = np.stack(
                [pad_or_trim(np.asarray(w, np.float32)) for w in part]
            )
            # int16 wire format when lossless (_upload_audio): 32 padded
            # windows are 61 MB of f32 — the biggest single transfer in
            # the short-clip batch path
            out.append(
                log_mel_spectrogram(
                    self._upload_audio(stacked), n_mels=self.dims.n_mels
                )
            )
        return out

    def _mel_batch(self, windows: list) -> jnp.ndarray:
        """One [N, n_mels, 3000] device array for N ≤30 s windows."""
        parts = self._mel_many(windows)
        return parts[0] if len(parts) == 1 else jnp.concatenate(parts, 0)

    def _upload_audio(self, padded: np.ndarray) -> jnp.ndarray:
        """Upload an audio array, shipping int16 over the wire when that is
        LOSSLESS: PCM-derived audio (16-bit WAV at 16 kHz, int16 arrays)
        lies exactly on the i/32768 grid, so sending int16 and
        reconstructing f32 on device (i.astype(f32)/2^15 — both exact in
        f32) is bit-identical at HALF the bytes. The upload is the
        dominant non-compute term of the long-form pipeline over this
        tunnel (measured r12: 12 min f32 = 46 MB ≈ 2.0 s of the 6.0 s
        wall in a degraded session, probe_pipeline_config --sync-timings).
        `ComputeOptions.int16_audio_transfer` forces the int16 wire format
        for off-grid audio too (FFmpeg float output, resampled files) at
        ≤2^-16 per-sample error — exactly what writing the same audio to a
        16-bit WAV would do.
        """
        flat = padded.ravel()
        # cheap prefix reject: float-valued audio (synthetic, FFmpeg FLT
        # output, resampled) falls off the grid in the first few samples —
        # don't pay a full-array pass to find that out (and don't scale
        # the full array just to check the head)
        head = flat[:65536] * np.float32(32768.0)
        i_head = np.rint(head)
        forced = self.config.compute_options.int16_audio_transfer
        # full int16 range: -32768 (a full-scale-negative sample, common in
        # clipped recordings) is representable and reconstructs exactly as
        # -32768/32768 = -1.0 — rejecting it forced a 2× f32 upload
        lossless = bool(
            (i_head >= -32768.0).all()
            and (i_head <= 32767.0).all()
            and (head == i_head).all()
        )
        if not (lossless or forced):
            return jnp.asarray(padded)
        # single C pass over the full array (check + convert together —
        # the NumPy path below is ~7 passes, ~4 s host-blocking at 60 min)
        from whisperkit_tpu.audio import native as _native

        grid = _native.f32_grid_to_i16(padded)
        if grid is not None:
            i16, lossless = grid
            if not (lossless or forced):
                return jnp.asarray(padded)
            return jnp.asarray(i16).astype(jnp.float32) / np.float32(32768.0)
        scaled = flat * np.float32(32768.0)  # NumPy fallback path only
        if lossless and len(scaled) > len(head):
            i_all = np.rint(scaled)
            lossless = bool(
                (i_all >= -32768.0).all()
                and (i_all <= 32767.0).all()
                and (scaled == i_all).all()
            )
        if not (lossless or forced):
            return jnp.asarray(padded)
        i16 = (
            np.clip(np.rint(scaled), -32768, 32767)
            .astype(np.int16)
            .reshape(padded.shape)
        )
        return jnp.asarray(i16).astype(jnp.float32) / np.float32(32768.0)

    def _mel_windows_from_audio(
        self, audio: np.ndarray, chunks: list
    ) -> "_MelStore":
        """Mels for contiguous-slice chunks of ONE audio array, uploading
        the audio ONCE: windows are extracted on-device (dynamic_slice +
        zero-mask past each chunk's length — identical to pad_or_trim
        semantics). The transport tunnel intermittently stalls large
        transfers (r4: a 29 MB upload once took 310 s), so one ~len(audio)
        upload beats re-uploading ~2.2× the bytes as padded windows.

        Returns a `_MelStore` over the [≤32, n_mels, 3000] sub-batch
        arrays: the group loop gathers its (length-sorted) rows with a few
        dispatches instead of one per window — over the relay each
        dispatch costs ~10-15 ms of host work even when async, and the old
        slice-out-32-rows-then-restack pattern measured ~0.4 s of the
        12-min headline wall (r12, tools/probe_upload.py session)."""
        padded = np.zeros(len(audio) + WINDOW_SAMPLES, np.float32)
        padded[: len(audio)] = audio
        audio_dev = self._upload_audio(padded)  # the single upload
        starts = [c.seek_offset_index for c in chunks]
        lengths = [min(len(c.audio_samples), WINDOW_SAMPLES) for c in chunks]
        out: list = []
        for i in range(0, len(chunks), 32):
            s = jnp.asarray(starts[i : i + 32], jnp.int32)
            n = jnp.asarray(lengths[i : i + 32], jnp.int32)
            wins = jax.vmap(
                lambda st: jax.lax.dynamic_slice(
                    audio_dev, (st,), (WINDOW_SAMPLES,)
                )
            )(s)
            wins = jnp.where(
                jnp.arange(WINDOW_SAMPLES)[None, :] < n[:, None], wins, 0.0
            )
            out.append(log_mel_spectrogram(wins, n_mels=self.dims.n_mels))
        return _MelStore(out)

    def _mesh(self):
        """Data-parallel mesh over all visible devices (SURVEY.md §2.6: the
        chunk batch shards over ICI; params replicate). Built lazily; None
        on a single device."""
        if self._mesh_plan is None:
            co = self.config.compute_options
            n = len(jax.devices())
            dp = co.dp_size or (n // (co.tp_size * co.dcn_size))
            if dp * co.tp_size * co.dcn_size <= 1:
                self._mesh_plan = False
            else:
                from whisperkit_tpu.parallel.mesh import make_mesh
                from whisperkit_tpu.parallel.sharding import shard_whisper_params

                self._mesh_plan = make_mesh(
                    dp=dp, tp=co.tp_size, dcn=co.dcn_size
                )
                try:
                    # tp>1: Megatron-split the weights (bf16 AND w_q/scale
                    # W8A16 trees share the rules); tp=1: replicate
                    self.params = shard_whisper_params(
                        self._mesh_plan, self.params
                    )
                except Exception as e:
                    # Fail loudly: silently replicating would quietly lose
                    # tensor parallelism the caller asked for (VERDICT r2).
                    raise ModelsUnavailable(
                        f"tensor-parallel sharding failed for this param "
                        f"tree (tp={co.tp_size}): {e}"
                    ) from e
        return self._mesh_plan or None

    # -- language detection -------------------------------------------------

    def detect_language(self, audio: Union[str, Path, np.ndarray]) -> tuple[str, dict[str, float]]:
        """Reference: WhisperKit.swift:534-581 `detectLangauge` [sic]."""
        if isinstance(audio, (str, Path)):
            audio = load_audio(audio)
        window = pad_or_trim(np.asarray(audio, np.float32))
        mel = self._mel(window)[None]
        _, ck, cv = encode_window(self.params, mel, self.dims, act8=self._act8)
        probs = np.asarray(
            detect_language_logits(
                self.params, ck, cv, dims=self.dims, special=self.tokenizer.special
            )
        )[0]
        order = np.argsort(probs)[::-1]
        lang_probs = {LANGUAGES[i][0]: float(probs[i]) for i in order[:10]}
        return LANGUAGES[int(order[0])][0], lang_probs

    def _encode(self, mel_batch, options: DecodingOptions):
        """encode_window with the serving-mode int8 cross-KV fused in
        (greedy path only — beam search tiles the raw bf16 arrays). When a
        draft model is attached and the batch is 1, the draft's cross-KV
        for the same window is computed alongside for speculative decode."""
        quantize = (
            self.config.compute_options.quantize_cross_kv
            and options.beam_size <= 1
        )
        # mirror every _decode_with_fallback guard knowable at encode time
        # (r5 review: word-timestamp/early-stop/segmented decodes can never
        # take the speculative path, so computing the draft encode for them
        # wasted a full draft forward + held its cross-KV on device)
        if (
            self.draft_params is not None
            and mel_batch.shape[0] == 1
            and options.beam_size <= 1
            and not (
                options.word_timestamps and self.alignment_heads is not None
            )
            and self.early_stop_flag is None
            and not self.config.compute_options.segmented_decode
        ):
            _, dck, dcv = encode_window(
                self.draft_params, mel_batch, self.draft_dims
            )
            self._draft_kv = (dck, dcv)
        else:
            self._draft_kv = None
        return encode_window(
            self.params, mel_batch, self.dims, quantize_kv=quantize,
            act8=self._act8,
        )

    def _detect_language_from_encoded(self, ck, cv, n_rows=None) -> str:
        """Detect the language of an encoded window batch: one masked decode
        step over ALL rows, languages ranked by mean probability across the
        first `n_rows` real rows (pad rows encode silence and would add
        noise; a single window reduces to the reference's per-window
        detection, TextDecoder.swift:420).

        When `quantize_cross_kv` serving mode is on, detection reads the
        int8 cross-KV (~2.6% activation error vs bf16) — on ambiguous audio
        the top-1 language could differ from the bf16 path. Accepted
        tradeoff: a separate bf16 encode for langid would double encoder
        cost in the opt-in serving mode (ADVICE r2 #1, documented).
        """
        probs = np.asarray(
            detect_language_logits(
                self.params, ck, cv, dims=self.dims,
                special=self.tokenizer.special,
            )
        )[: (n_rows or None)].mean(axis=0)
        return LANGUAGES[int(np.argmax(probs))][0]

    def _detect_languages_per_row(self, ck, cv, n_rows=None) -> list[str]:
        """Per-ROW language detection over an encoded batch: one masked
        decode step, argmax per row (no cross-row averaging). Used by the
        continuous-batching scheduler, where the rows of one batch belong
        to DIFFERENT requests (reference semantics: each transcription job
        detects its own language, TextDecoder.swift:420 — the batch is a
        TPU-side packing detail that must not leak across jobs)."""
        probs = np.asarray(
            detect_language_logits(
                self.params, ck, cv, dims=self.dims,
                special=self.tokenizer.special,
            )
        )[: (n_rows or None)]
        return [LANGUAGES[int(i)][0] for i in np.argmax(probs, axis=-1)]

    def _group_languages(
        self,
        options: DecodingOptions,
        ck,
        cv,
        n_real: int,
        *,
        pad_to: Optional[int] = None,
        per_row: bool = False,
    ) -> list[str]:
        """THE language-resolution ladder for a batch of encoded windows —
        every batched caller (short-clip batch, VAD groups, the continuous
        -batching scheduler) goes through here so the semantics can't
        drift: explicit language → non-multilingual "en" → per-row argmax
        (`per_row=True`: rows are unrelated files/windows that must not
        share a detection) → once-per-file cached detection. Pad rows
        repeat the first language (they are discarded after decode)."""
        if options.language:
            langs = [options.language] * n_real
        elif not self.is_multilingual:
            langs = ["en"] * n_real
        elif per_row:
            langs = list(self._detect_languages_per_row(ck, cv, n_real))
        else:
            langs = [self._resolve_language(options, ck, cv, n_real)] * n_real
        if pad_to is not None and pad_to > n_real:
            langs = langs + [langs[0]] * (pad_to - n_real)
        return langs

    # -- decode with fallback -----------------------------------------------

    def _decode_with_fallback(
        self,
        cross_k,
        cross_v,
        options: DecodingOptions,
        language,
        window_index: int,
    ) -> list[_WindowDecode]:
        """Temperature ladder over a batch of encoded windows.

        Reference: TranscribeTask.swift:316-411 `decodeWithFallback`. Failed
        rows are re-decoded at the next temperature; accepted rows keep their
        first passing result.

        `language` is one code for the whole batch, or a per-row sequence
        (len == batch): the prompt layout is language-invariant — only the
        language TOKEN differs — so rows with different languages share one
        static-shape batched decode (continuous-batching scheduler packs
        windows of unrelated requests into one batch).
        """
        sp = self.tokenizer.special
        # int8 cross-KV arrives as a {"q8","scale"} dict (fused in _encode)
        b = (
            cross_k["q8"].shape[1]
            if isinstance(cross_k, dict)
            else cross_k.shape[1]
        )
        langs = [language] * b if isinstance(language, str) else list(language)
        if len(langs) != b:
            raise ValueError(
                f"per-row languages: got {len(langs)} for batch of {b}"
            )
        prompts = [self._build_prompt(options, lg) for lg in langs]
        prompt, sot_index = prompts[0]
        prompt_arr = jnp.asarray([p for p, _ in prompts], jnp.int32)
        suppress = self._suppress_bias(options)
        max_new = min(options.sample_length, MAX_TOKEN_CONTEXT - len(prompt))
        capture = options.word_timestamps and self.alignment_heads is not None
        align_heads = (
            tuple(map(tuple, np.asarray(self.alignment_heads)))
            if capture
            else None
        )

        # (int8 cross-KV now happens INSIDE encode_window — see _encode —
        # so the bf16 copy never coexists with the int8 one on-device)

        # DecodingCache (Models.swift:325-339) made sound for Whisper: the
        # prompt pass has no sampling, so every rung of the temperature
        # ladder reuses ONE prefill instead of re-running it. Computed
        # lazily: beam_decode_loop runs its own prompt pass, so a beam-mode
        # rung 0 that succeeds never pays for a prefill it can't consume.
        from whisperkit_tpu.decoding.loop import prefill_window

        prefill = None
        # int8 self-KV rides the shared prefill: the cache TYPE is fixed at
        # allocation, so the flag only matters here (decode_loop consumes
        # whatever cache the prefill carries)
        qskv = self.config.compute_options.quantize_self_kv

        def get_prefill():
            nonlocal prefill
            if prefill is None:
                t_pre = time.perf_counter()
                prefill = prefill_window(
                    self.params, cross_k, cross_v, prompt_arr,
                    dims=self.dims, special=sp, sample_begin=len(prompt),
                    max_new_tokens=max_new, sot_index=sot_index,
                    alignment_heads=align_heads, quantize_self_kv=qskv,
                )
                self.timings.prefill += time.perf_counter() - t_pre
            else:
                self.timings.prefill_cache_hits += 1
            return prefill

        results: list[Optional[_WindowDecode]] = [None] * b
        for rung, temperature in enumerate(options.temperatures):
            t0 = time.perf_counter()
            scalars = self._decode_scalars(options, temperature, window_index * 101 + rung)
            use_beam = options.beam_size > 1 and temperature == 0.0
            if use_beam:
                from whisperkit_tpu.decoding.beam import beam_decode_loop

                out = beam_decode_loop(
                    self.params,
                    cross_k,
                    cross_v,
                    prompt_arr,
                    suppress,
                    scalars.max_initial_timestamp_index,
                    dims=self.dims,
                    special=sp,
                    sample_begin=len(prompt),
                    max_new_tokens=max_new,
                    beam_size=options.beam_size,
                    sot_index=sot_index,
                    use_timestamp_rules=not options.without_timestamps,
                    suppress_blank=options.suppress_blank,
                    length_penalty=options.length_penalty,
                )
            elif (
                self._draft_kv is not None
                and b == 1
                and temperature == 0.0
                and not capture
                and self.early_stop_flag is None
                and not self.config.compute_options.segmented_decode
            ):
                # batch-1 latency mode: lossless draft-verify (greedy-exact
                # for any draft; decoding/speculative.py). Computes its own
                # headroom-sized prefill — the shared get_prefill() buffers
                # are sized to `total` and would clamp the verify writes.
                from whisperkit_tpu.decoding.speculative import (
                    speculative_decode_loop,
                )

                dck, dcv = self._draft_kv
                out = speculative_decode_loop(
                    self.params, self.draft_params, cross_k, cross_v,
                    dck, dcv, prompt_arr, suppress, scalars,
                    dims=self.dims, draft_dims=self.draft_dims, special=sp,
                    sample_begin=len(prompt), max_new_tokens=max_new,
                    sot_index=sot_index,
                    use_timestamp_rules=not options.without_timestamps,
                    suppress_blank=options.suppress_blank,
                )
            else:
                flag = self.early_stop_flag
                decode_kwargs = dict(
                    dims=self.dims,
                    special=sp,
                    sample_begin=len(prompt),
                    max_new_tokens=max_new,
                    top_k=options.top_k,
                    sot_index=sot_index,
                    use_timestamp_rules=not options.without_timestamps,
                    suppress_blank=options.suppress_blank,
                    alignment_heads=align_heads,
                    prefill=get_prefill(),
                )
                segmented = self.config.compute_options.segmented_decode
                if flag is not None or segmented:
                    from whisperkit_tpu.decoding.loop import decode_loop_segmented

                    out = decode_loop_segmented(
                        self.params, cross_k, cross_v, prompt_arr, suppress,
                        scalars,
                        should_stop=(
                            (lambda: flag.should_stop) if flag is not None else None
                        ),
                        compact=segmented,
                        **decode_kwargs,
                    )
                else:
                    out = decode_loop(
                        self.params, cross_k, cross_v, prompt_arr, suppress,
                        scalars, **decode_kwargs,
                    )
            # ONE host transfer for the rung's outputs (three separate
            # np.asarray pulls pay the tunnel RTT each)
            tokens_np, lps_np, nsp_np = jax.device_get(
                (out.tokens, out.token_logprobs, out.no_speech_prob)
            )
            if capture and not use_beam:
                align_np = np.asarray(out.alignment)
            elif capture and use_beam:
                # beam search doesn't capture in-loop: one teacher-forced
                # pass over the winning hypotheses (openai timing.py style)
                from whisperkit_tpu.decoding.loop import alignment_forward

                align_np = np.asarray(
                    alignment_forward(
                        self.params, cross_k, cross_v, out.tokens,
                        dims=self.dims, alignment_heads=align_heads,
                    )
                )
            else:
                align_np = None
            self.timings.decoding_loop += time.perf_counter() - t0
            if rung > 0:
                self.timings.decoding_fallback += time.perf_counter() - t0
                self.timings.total_decoding_fallbacks += b

            any_pending = False
            for i in range(b):
                if results[i] is not None:
                    continue
                row = tokens_np[i, len(prompt):]
                # sampled tokens up to and including first EOT
                eots = np.nonzero(row == sp.eot)[0]
                n = int(eots[0]) if len(eots) else len(row)
                sampled = row[:n].tolist()
                lps = lps_np[i, len(prompt) : len(prompt) + n].tolist()
                eot_lp = (
                    float(lps_np[i, len(prompt) + n]) if n < len(row) else 0.0
                )
                self.timings.total_decoding_loops += n + (1 if n < len(row) else 0)
                avg_lp = (sum(lps) + eot_lp) / (n + 1) if n else eot_lp
                text = self.tokenizer.decode(sampled)
                cr = compression_ratio_text(text)
                first_lp = lps[0] if lps else None
                fallback = DecodingFallback.evaluate(
                    logprob_threshold=options.logprob_threshold,
                    first_token_logprob_threshold=options.first_token_log_prob_threshold,
                    no_speech_threshold=options.no_speech_threshold,
                    compression_ratio_threshold=options.compression_ratio_threshold,
                    compression_ratio=cr,
                    avg_logprob=avg_lp,
                    first_token_logprob=first_lp,
                    no_speech_prob=float(nsp_np[i]),
                )
                is_last_rung = rung == len(options.temperatures) - 1
                if fallback is None or not fallback.need_fallback or is_last_rung:
                    results[i] = _WindowDecode(
                        tokens=sampled,
                        logprobs=lps,
                        avg_logprob=avg_lp,
                        compression_ratio=cr,
                        no_speech_prob=float(nsp_np[i]),
                        temperature=temperature,
                        language=langs[i],
                        alignment=(
                            align_np[: len(prompt) + n + 1, i]
                            if align_np is not None
                            else None
                        ),
                        sample_begin=len(prompt),
                    )
                else:
                    any_pending = True
            if not any_pending:
                break
        return results  # type: ignore[return-value]

    # -- transcribe ---------------------------------------------------------

    def transcribe(
        self,
        audio: Union[str, Path, np.ndarray, Sequence],
        decode_options: Optional[DecodingOptions] = None,
        callback: Optional[Callable[[TranscriptionProgress], Optional[bool]]] = None,
    ) -> Union[TranscriptionResult, list]:
        """Transcribe a path, an array, or a list of either.

        Reference: the `transcribe` overload family (WhisperKit.swift:586-812).
        A list input returns a list of per-item results (exceptions preserved
        per-item like the reference's batch API, WhisperKit.swift:644-660).
        """
        options = decode_options or DecodingOptions()
        if isinstance(audio, (list, tuple)):
            return self._transcribe_batch(list(audio), options, callback)
        t0 = time.perf_counter()
        timings = TranscriptionTimings(pipeline_start=t0)
        self.timings = timings
        self._detected_language = None  # per-call; never reuse across files
        if isinstance(audio, (str, Path)):
            audio = load_audio(audio)
            timings.audio_loading = time.perf_counter() - t0
        audio = np.asarray(audio, np.float32)
        timings.input_audio_seconds = max(len(audio) / SAMPLE_RATE, 1e-3)

        if self.params is None:
            raise ModelsUnavailable("models not loaded")

        use_vad = (
            options.chunking_strategy == ChunkingStrategy.VAD
            and len(audio) > WINDOW_SAMPLES
        )
        if use_vad:
            result = self._transcribe_vad_chunked(audio, options, callback)
        else:
            result = self._transcribe_array(audio, options, callback)
        timings.full_pipeline = time.perf_counter() - t0
        result.timings = timings
        return result

    def _transcribe_batch(self, items: list, options: DecodingOptions, callback=None) -> list:
        """Batch API: short items (≤ one window) are STACKED into one
        batched decode; longer ones run through their own (internally
        batched) paths. Per-item failures are preserved in order.

        Reference: the TaskGroup batch overloads (WhisperKit.swift:716-812,
        error mixing :644-660) — but with a real batch dimension.
        """
        loaded: list = [None] * len(items)
        results: list = [None] * len(items)

        # parallel file loading (reference: TaskGroup loadAudio(at:),
        # AudioProcessor.swift:352-371) — decode/resample is ffmpeg+host
        # work, so a thread pool overlaps the IO; arrays pass straight
        # through
        def load_one(item):
            if isinstance(item, (str, Path)):
                return load_audio(item)
            return np.asarray(item, np.float32)

        paths = [i for i, it in enumerate(items) if isinstance(it, (str, Path))]
        if len(paths) > 1:
            import concurrent.futures

            with concurrent.futures.ThreadPoolExecutor(
                max_workers=min(8, len(paths))
            ) as pool:
                futures = {i: pool.submit(load_one, items[i]) for i in paths}
            for i, item in enumerate(items):
                try:
                    loaded[i] = futures[i].result() if i in futures else load_one(item)
                except Exception as e:
                    results[i] = e
        else:
            for i, item in enumerate(items):
                try:
                    loaded[i] = load_one(item)
                except Exception as e:
                    results[i] = e

        short_idx = [
            i for i, a in enumerate(loaded)
            if results[i] is None and a is not None and len(a) <= WINDOW_SAMPLES
        ]
        # one batched mel→encode→decode for all short items
        group = max(1, options.concurrent_worker_count)
        for start in range(0, len(short_idx), group):
            batch_ids = short_idx[start : start + group]
            try:
                batch_results = self._transcribe_short_batch(
                    [loaded[i] for i in batch_ids], options
                )
                for i, r in zip(batch_ids, batch_results):
                    results[i] = r
            except Exception as e:
                for i in batch_ids:
                    results[i] = e
        # long items: sequential (each internally batched via VAD)
        for i, a in enumerate(loaded):
            if results[i] is None:
                try:
                    results[i] = self.transcribe(a, options, callback)
                except Exception as e:
                    results[i] = e
        return results

    def _transcribe_short_batch(
        self, audios: list, options: DecodingOptions
    ) -> list:
        """Decode N ≤30 s clips as one batch.

        Language is resolved PER ROW: the rows are unrelated files, so
        detection must not average across them (reference: each item's
        TranscribeTask detects its own language, TextDecoder.swift:420).
        `_decode_with_fallback` already takes a per-row language list —
        rows with different languages share one static-shape batched
        decode (only the language TOKEN differs).
        """
        t0 = time.perf_counter()
        mel_batch = self._mel_batch(audios)
        _, ck, cv = self._encode(mel_batch, options)
        self._detected_language = None
        langs = self._group_languages(options, ck, cv, len(audios), per_row=True)
        decodes = self._decode_with_fallback(ck, cv, options, langs, 0)
        sp = self.tokenizer.special
        out = []
        for a, wd in zip(audios, decodes):
            window_frames = min(WINDOW_FRAMES, math.ceil(len(a) / 160))
            if self._should_skip_silent(wd, options):
                segments = []
            else:
                res = find_seek_point_and_segments(
                    tokens=wd.tokens, token_logprobs=wd.logprobs, special=sp,
                    time_offset=0.0, window_frames=window_frames, seek=0,
                    decode_fn=self.tokenizer.decode, temperature=wd.temperature,
                    avg_logprob=wd.avg_logprob,
                    compression_ratio=wd.compression_ratio,
                    no_speech_prob=wd.no_speech_prob,
                )
                segments = res.segments
                if options.word_timestamps and wd.alignment is not None:
                    segments = self._add_word_timestamps(
                        segments, wd, 0.0, window_frames, options
                    )
                for s in segments:
                    s.language = wd.language
            result = TranscriptionResult(
                text="".join(s.text for s in segments).strip(),
                segments=segments, language=wd.language,
            )
            result.timings.input_audio_seconds = len(a) / SAMPLE_RATE
            result.timings.full_pipeline = time.perf_counter() - t0
            out.append(result)
        return out

    def _transcribe_vad_chunked(
        self, audio: np.ndarray, options: DecodingOptions, callback=None
    ) -> TranscriptionResult:
        """VAD-chunk + batched decode (reference: WhisperKit.swift:867-931 →
        TaskGroup; here real batches).

        Chunks are decoded in sub-batches of `concurrent_worker_count`
        windows (padded to that fixed size so XLA compiles ONE shape):
        hours-long audio stays memory-bounded — cross-attention KV for an
        unbounded batch would exceed HBM.
        """
        chunker = VADAudioChunker()
        # honor clip_timestamps: chunk each clip region independently,
        # keeping absolute sample offsets (reference: prepareSeekClips)
        t_chunk = time.perf_counter()
        content_frames = len(audio) // 160
        clips = self._prepare_seek_clips(options, content_frames)
        chunks = []
        for clip_start_f, clip_end_f in clips:
            region = audio[clip_start_f * 160 : clip_end_f * 160]
            for c in chunker.chunk_all(region, max_chunk_length=WINDOW_SAMPLES):
                c.seek_offset_index += clip_start_f * 160
                chunks.append(c)
        # host-side VAD/chunking → the Audio Processing row (reference
        # stamps it around AudioProcessor work, Models.swift:478-539)
        self.timings.audio_processing += time.perf_counter() - t_chunk
        self.timings.total_audio_processing_runs += 1
        # One audio upload + batched on-device window extraction + one mel
        # dispatch per ≤32 chunks (instead of one upload+dispatch per
        # chunk): under a degraded tunnel every transfer/dispatch pays the
        # full RTT and large transfers can stall outright (r4 measurements
        # in _mel_windows_from_audio).
        t_mel = time.perf_counter()
        mels = self._mel_windows_from_audio(audio, chunks)
        self._stage_sync(mels.batches)
        self.timings.log_mels += time.perf_counter() - t_mel
        metas = [
            (
                c.seek_offset_index,
                min(WINDOW_FRAMES, math.ceil(len(c.audio_samples) / 160)),
            )
            for c in chunks
        ]
        self.timings.total_log_mel_runs += mels.n

        plan = self._mesh()
        group = max(1, options.concurrent_worker_count)
        # clamp to the chunk-count bucket: decoding a group runs the
        # while_loop until its SLOWEST row, so pad rows burn the full token
        # budget — a 12 min file (~24 chunks) at group 64 measured 0.0041
        # RTF vs 0.0027 at group 32 (tools/probe_turbo_b64.py). Power-of-two
        # buckets keep the compiled-shape count logarithmic.
        if chunks:
            bucket = 1 << max(0, math.ceil(math.log2(len(chunks))))
            group = min(group, bucket)
        if plan is not None:
            group = plan.pad_batch(group)  # dp multiple
        pad_mel = None

        # length-sort chunks into batches: the decode while_loop runs until
        # the SLOWEST row finishes (decoding/loop.py cond), so batching
        # similar-length chunks together minimizes finished-row waste
        # (token count tracks speech duration). Results re-land at their
        # original chunk index for segment assembly.
        order = sorted(
            range(len(chunks)), key=lambda i: len(chunks[i].audio_samples)
        )
        decodes: list[Optional[_WindowDecode]] = [None] * mels.n
        decoded_count = 0
        cancelled = False
        for start in range(0, len(order), group):
            batch_ids = order[start : start + group]
            n_real = len(batch_ids)
            # tail-bucket clamp (r5): the final PARTIAL group decodes at the
            # power-of-two bucket covering its real rows instead of the full
            # group width — pad rows cost real decode bandwidth (the
            # while_loop runs to the slowest row, and per-step cost scales
            # with the group's KV rows), so a 2-row tail padded to 32 pays
            # ~a full group decode for nothing. Power-of-two buckets keep
            # the extra compiled shapes logarithmic (≤log2(group) per
            # config), and the bench/pipeline full-audio warmup covers them.
            gsize = group
            if n_real < group:
                gsize = 1 << max(0, math.ceil(math.log2(n_real)))
                if plan is not None:
                    gsize = plan.pad_batch(gsize)  # keep dp divisibility
                gsize = min(gsize, group)
            if n_real < gsize and pad_mel is None:  # pad to compiled size
                pad_mel = self._mel(np.zeros(WINDOW_SAMPLES, np.float32))
            # few-dispatch gather straight from the mel sub-batches
            # (_MelStore.take — the per-window slice + restack pattern
            # paid one relay dispatch per row)
            mel_batch = mels.take(batch_ids, pad_to=gsize, pad_row=pad_mel)
            if plan is not None:
                from whisperkit_tpu.parallel.mesh import shard_batch

                mel_batch = shard_batch(plan, mel_batch)
            # windowPreprocess hook, once per real window of the group
            # (reference: TranscribeTask.swift:42-47 fires it for every
            # window of every VAD chunk). NOTE: chunks decode in
            # length-sorted order, so preprocess hooks fire out of
            # chronological order; window_post_process below fires in
            # chronological (assembly) order.
            for i in batch_ids:
                self.window_preprocess(
                    chunks[i].audio_samples, metas[i][0] // 160, metas[i][1]
                )
            t_enc = time.perf_counter()
            _, ck, cv = self._encode(mel_batch, options)
            self._stage_sync(cv)
            self.timings.encoding += time.perf_counter() - t_enc
            self.timings.total_encoding_runs += n_real
            # language resolve: detect_language=True re-detects PER ROW
            # every group (reference re-detects every window,
            # TranscribeTask.swift:327 → TextDecoder.swift:420 — and the
            # rows are different time ranges, so code-switched audio gets
            # per-window languages); an unset language detects once/file
            group_langs = self._group_languages(
                options, ck, cv, n_real,
                pad_to=gsize, per_row=options.detect_language,
            )
            batch_decodes = self._decode_with_fallback(
                ck, cv, options, group_langs, start
            )[:n_real]
            if self.timings.first_token_time == 0.0:
                # first group's tokens land together (batched decode);
                # stamp TTFT at its completion — the VAD-path analog of
                # the seek path's per-window stamp (Models.swift:483)
                self.timings.first_token_time = time.perf_counter()
            for i, wd in zip(batch_ids, batch_decodes):
                decodes[i] = wd
            # One callback per finished WINDOW of the group (the reference's
            # SegmentDiscovery granularity, Models.swift:643-728). NOTE on
            # ordering: chunks are length-sorted into groups, so windows
            # finish out of chronological order — `window_id` is the
            # window's ORIGINAL chunk index, `windows_decoded` counts
            # progress, and a False return leaves later-arriving (longer)
            # chunks undecoded rather than a clean time prefix.
            if callback is not None:
                for i, wd in zip(batch_ids, batch_decodes):
                    decoded_count += 1
                    progress = TranscriptionProgress(
                        timings=self.timings,
                        text=self.tokenizer.decode(wd.tokens),
                        tokens=wd.tokens,
                        temperature=wd.temperature,
                        avg_logprob=wd.avg_logprob,
                        compression_ratio=wd.compression_ratio,
                        window_id=i,
                        windows_decoded=decoded_count,
                    )
                    if callback(progress) is False:
                        cancelled = True
                        break
                if cancelled:
                    break
        self.timings.total_decoding_windows += sum(
            1 for wd in decodes if wd is not None
        )

        all_segments: list[TranscriptionSegment] = []
        sp = self.tokenizer.special
        t_windowing = time.perf_counter()
        for (start_sample, window_frames), wd in zip(metas, decodes):
            if wd is None:  # cancelled (callback False) before this window
                continue
            if self._should_skip_silent(wd, options):
                continue
            res = find_seek_point_and_segments(
                tokens=wd.tokens,
                token_logprobs=wd.logprobs,
                special=sp,
                time_offset=start_sample / SAMPLE_RATE,
                window_frames=window_frames,
                seek=start_sample // 160,
                decode_fn=self.tokenizer.decode,
                temperature=wd.temperature,
                avg_logprob=wd.avg_logprob,
                compression_ratio=wd.compression_ratio,
                no_speech_prob=wd.no_speech_prob,
                segment_id_start=len(all_segments),
            )
            segs = res.segments
            if options.word_timestamps and wd.alignment is not None:
                segs = self._add_word_timestamps(
                    segs, wd, start_sample / SAMPLE_RATE, window_frames, options
                )
            for s in segs:
                s.language = wd.language
            segs = self.window_post_process(
                start_sample // 160, window_frames, segs
            )
            all_segments.extend(segs)
        # host-side segment assembly (timestamp pairing, token decode,
        # hooks) → the Windowing row
        self.timings.decoding_windowing += time.perf_counter() - t_windowing
        text = "".join(s.text for s in all_segments)
        # result.language = the majority language across decoded windows
        # (NOT last-group-wins); per-segment .language carries the detail
        # on code-switched audio
        language = self._majority_language(
            [wd.language for wd in decodes if wd is not None], options
        )
        return TranscriptionResult(
            text=text.strip(), segments=all_segments, language=language
        )

    @staticmethod
    def _majority_language(
        window_langs: list, options: DecodingOptions
    ) -> str:
        """Majority language across a file's decoded windows (ties break to
        the earlier-seen language); per-segment .language carries the
        per-window detail on code-switched audio."""
        if not window_langs:
            return options.language or "en"
        counts: dict[str, int] = {}
        for lg in window_langs:
            counts[lg] = counts.get(lg, 0) + 1
        # max() keeps the FIRST key with the maximal count, and dict order
        # is first-seen — ties already break to the earlier language
        return max(counts, key=counts.get)

    def _resolve_language(self, options: DecodingOptions, ck, cv, n_rows=None) -> str:
        """Resolve the decode language for the current window/group.

        Reference semantics (TranscribeTask.swift:327 → TextDecoder.swift:420):
        `detectLanguage=True` re-detects inside every window's
        decodeWithFallback — callers therefore invoke this for EVERY
        window/group (detection at group granularity on the batched VAD
        path), so code-switched audio re-resolves as it goes. When the
        language is merely unset, detection runs once per call on the first
        window and is cached (a deliberate divergence: one masked decode step
        per file instead of one per window).
        """
        if options.language:
            return options.language
        if not self.is_multilingual:
            return "en"
        if options.detect_language:
            return self._detect_language_from_encoded(ck, cv, n_rows)
        if self._detected_language is None:
            self._detected_language = self._detect_language_from_encoded(
                ck, cv, n_rows
            )
        return self._detected_language

    def _should_skip_silent(self, wd: _WindowDecode, options: DecodingOptions) -> bool:
        """openai-style no-speech window skip (mirrored by the reference's
        silence acceptance, Models.swift:357-381)."""
        if options.no_speech_threshold is None:
            return False
        if wd.no_speech_prob <= options.no_speech_threshold:
            return False
        if (
            options.logprob_threshold is not None
            and wd.avg_logprob >= options.logprob_threshold
        ):
            return False
        return True

    def _transcribe_array(
        self,
        audio: np.ndarray,
        options: DecodingOptions,
        callback=None,
    ) -> TranscriptionResult:
        """Sequential seek-window loop (reference: TranscribeTask.swift:57-296).

        Long-form mel follows openai/whisper `transcribe()` exactly: the
        log-mel is computed ONCE over the whole audio (zero-padded to a
        30 s-bucket boundary plus one extra window, so every 3000-frame
        window slice is in range) with the max-clamp normalization GLOBAL
        over the file, and each seek window is a slice of it. This is both
        cheaper than re-melling overlapping windows (the reference's
        per-window CoreML mel, FeatureExtractor.swift:40-56, recomputes the
        overlap and normalizes per window) and bit-matches the
        openai/transformers long-form semantics the full-pipeline parity
        test pins (tests/test_hf_generate_parity.py). Bucketing keeps the
        compiled mel shapes to one per 30 s of audio length.
        """
        sp = self.tokenizer.special
        content_frames = len(audio) // 160
        seek_clips = self._prepare_seek_clips(options, content_frames)

        full_mel = None
        if content_frames > WINDOW_FRAMES:
            total_frames = (content_frames // WINDOW_FRAMES + 2) * WINDOW_FRAMES
            padded = np.zeros(total_frames * 160, np.float32)
            padded[: len(audio)] = audio
            t_mel = time.perf_counter()
            full_mel = log_mel_spectrogram(
                self._upload_audio(padded), n_mels=self.dims.n_mels,
                n_frames=total_frames,
            )
            self.timings.log_mels += time.perf_counter() - t_mel
            self.timings.total_log_mel_runs += 1

        all_segments: list[TranscriptionSegment] = []
        language = options.language
        window_langs: list[str] = []
        window_index = 0

        for clip_start, clip_end in seek_clips:
            seek = clip_start
            window_padding = max(1, int(options.window_clip_time * FRAMES_PER_SECOND))
            while seek < min(clip_end, content_frames):
                remaining = content_frames - seek
                if seek > clip_start and remaining < window_padding:
                    break  # trailing sliver, reference windowClipTime padding
                window_frames = min(WINDOW_FRAMES, min(remaining, clip_end - seek))
                self.window_preprocess(
                    audio[seek * 160 : seek * 160 + WINDOW_SAMPLES],
                    seek, window_frames,
                )
                if full_mel is not None:
                    mel = jax.lax.dynamic_slice_in_dim(
                        full_mel, seek, WINDOW_FRAMES, axis=-1
                    )[None]
                else:
                    window = audio[seek * 160 : seek * 160 + WINDOW_SAMPLES]
                    t_mel = time.perf_counter()
                    mel = self._mel(pad_or_trim(window))[None]
                    self.timings.log_mels += time.perf_counter() - t_mel
                    self.timings.total_log_mel_runs += 1
                t_enc = time.perf_counter()
                _, ck, cv = self._encode(mel, options)
                self.timings.encoding += time.perf_counter() - t_enc
                self.timings.total_encoding_runs += 1

                # re-resolve per window: detect_language=True re-detects
                # every window (TranscribeTask.swift:327); an unset language
                # is detected once on the first window and cached
                language = self._resolve_language(options, ck, cv)

                wd = self._decode_with_fallback(
                    ck, cv, options, language, window_index
                )[0]
                window_langs.append(wd.language)
                self.timings.total_decoding_windows += 1
                if self.timings.first_token_time == 0.0:
                    self.timings.first_token_time = time.perf_counter()

                if self._should_skip_silent(wd, options):
                    seek += window_frames
                    window_index += 1
                    continue

                res = find_seek_point_and_segments(
                    tokens=wd.tokens,
                    token_logprobs=wd.logprobs,
                    special=sp,
                    time_offset=seek / FRAMES_PER_SECOND,
                    window_frames=window_frames,
                    seek=seek,
                    decode_fn=self.tokenizer.decode,
                    temperature=wd.temperature,
                    avg_logprob=wd.avg_logprob,
                    compression_ratio=wd.compression_ratio,
                    no_speech_prob=wd.no_speech_prob,
                    segment_id_start=len(all_segments),
                )
                segs = res.segments
                if options.word_timestamps and wd.alignment is not None:
                    segs = self._add_word_timestamps(
                        segs, wd, seek / FRAMES_PER_SECOND, window_frames, options
                    )
                for s in segs:
                    s.language = wd.language
                segs = self.window_post_process(seek, window_frames, segs)
                all_segments.extend(segs)

                advance = res.seek_advance_frames
                if options.max_window_seek is not None:
                    advance = min(
                        advance, int(options.max_window_seek * FRAMES_PER_SECOND)
                    )
                advance = max(advance, 1)
                seek += advance
                window_index += 1

                if callback is not None:
                    progress = TranscriptionProgress(
                        timings=self.timings,
                        text=self.tokenizer.decode(wd.tokens),
                        tokens=wd.tokens,
                        temperature=wd.temperature,
                        avg_logprob=wd.avg_logprob,
                        compression_ratio=wd.compression_ratio,
                        window_id=window_index,
                    )
                    if callback(progress) is False:
                        seek = clip_end  # early stop (EarlyStopActor semantics)
                        break

        text = "".join(s.text for s in all_segments)
        return TranscriptionResult(
            text=text.strip(),
            segments=all_segments,
            # majority across decoded windows — the same no-last-window-wins
            # rule as the VAD path (per-segment .language has the detail)
            language=self._majority_language(window_langs, options),
        )

    # -- subclass hooks ------------------------------------------------------

    def window_preprocess(
        self, window_audio: np.ndarray, seek: int, segment_size: int
    ) -> None:
        """Subclass hook invoked before each seek window is decoded — for
        side work that can run alongside the decode (reference:
        TranscribeTask.swift:42-47 `windowPreprocess`)."""

    def window_post_process(
        self, seek: int, segment_size: int, segments: list
    ) -> list:
        """Subclass hook invoked after a seek window's segments are built;
        may replace them (reference: TranscribeTask.swift:49-55
        `windowPostProcess`)."""
        return segments

    def _prepare_seek_clips(
        self, options: DecodingOptions, content_frames: int
    ) -> list[tuple[int, int]]:
        """clip_timestamps (seconds) → [start_frame, end_frame) pairs.

        Reference: Extensions+Internal.swift:112-131 `prepareSeekClips`.
        """
        ts = list(options.clip_timestamps or ())
        if not ts:
            return [(0, content_frames)]
        frames = [int(t * FRAMES_PER_SECOND) for t in ts]
        if len(frames) % 2 == 1:
            frames.append(content_frames)
        return [(frames[i], frames[i + 1]) for i in range(0, len(frames), 2)]

    def _add_word_timestamps(self, segments, wd, time_offset, window_frames, options):
        from whisperkit_tpu.text.word_timestamps import add_word_timestamps

        t0 = time.perf_counter()
        try:
            return add_word_timestamps(
                segments=segments,
                alignment=wd.alignment,
                sample_begin=wd.sample_begin,
                tokens=wd.tokens,
                tokenizer=self.tokenizer,
                language=wd.language,
                time_offset=time_offset,
                window_frames=window_frames,
            )
        finally:
            self.timings.decoding_timestamp_alignment += time.perf_counter() - t0
