"""TTSPipeline — text-to-speech façade + engine.

Reference: Sources/TTSKit/TTSKit.swift (façade, chunked generation with
ordered delivery + 100 ms equal-power crossfade :760-972, streaming `play`
strategies :994-1063, prompt-cache build/save/load :609-683),
Qwen3Config.swift (variants/speakers), TextChunker.swift, PromptCache.swift.

TPU-native restructuring: the reference synthesizes sentence chunks in
concurrent TaskGroups of batch-of-1; here chunks are STACKED into one
batched AR generation (per-row done masks), and the vocoder decodes all
frames in one batched conv call instead of frame-by-frame
(models/qwen3_tts.py).
"""

from __future__ import annotations

import dataclasses
import re
import time
from pathlib import Path
from typing import Iterator, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from whisperkit_tpu.audio.output import PlaybackStrategy, crossfade
from whisperkit_tpu.core.logging import logging
from whisperkit_tpu.decoding.tts_loop import TTSScalars, tts_generate_loop, tts_prefill
from whisperkit_tpu.models.qwen3_tts import (
    CODEC_BOS,
    CODEC_EOS,
    CODEC_PAD,
    CODEC_THINK,
    CODEC_THINK_BOS,
    CODEC_THINK_EOS,
    DEFAULT_SPEAKER,
    DEFAULT_TTS_LANGUAGE,
    OUTPUT_SAMPLE_RATE,
    SAMPLES_PER_FRAME,
    SPEAKERS,
    TTS_LANGUAGES,
    Qwen3TTSDims,
    TINY_TTS_DIMS,
    init_tts_params,
    speech_decoder_forward,
)

# kept as module aliases for callers; values are CODEC-track token ids
# (Qwen3Models.swift:88-174), not text-vocab rows
LANGUAGES = list(TTS_LANGUAGES)


@dataclasses.dataclass
class GenerationOptions:
    """Reference: TTSKit/Models.swift:219-287 `GenerationOptions`."""

    voice: Optional[str] = None
    language: str = "english"
    instruction: Optional[str] = None
    temperature: float = 0.9
    top_k: int = 50
    repetition_penalty: float = 1.05
    max_new_tokens: int = 245
    seed: int = 0
    chunking_strategy: str = "sentence"
    target_chunk_size: int = 200
    min_chunk_size: int = 40
    concurrent_worker_count: int = 4  # becomes the generation batch size
    crossfade_seconds: float = 0.1
    use_prompt_cache: bool = True


@dataclasses.dataclass
class SpeechTimings:
    """Reference: TTSKit/Models.swift `SpeechTimings` (20+ fields)."""

    tokenize_seconds: float = 0.0
    prefill_seconds: float = 0.0
    generate_seconds: float = 0.0
    vocode_seconds: float = 0.0
    total_seconds: float = 0.0
    frames: int = 0
    chunks: int = 0
    time_to_first_buffer: float = 0.0

    @property
    def ms_per_step(self) -> float:
        return 1000.0 * self.generate_seconds / max(self.frames, 1)

    @property
    def frames_per_second(self) -> float:
        return self.frames / max(self.generate_seconds, 1e-9)

    @property
    def real_time_ratio(self) -> float:
        audio_seconds = self.frames * SAMPLES_PER_FRAME / OUTPUT_SAMPLE_RATE
        return audio_seconds / max(self.total_seconds, 1e-9)


@dataclasses.dataclass
class SpeechResult:
    """Reference: `SpeechResult` (TTSKit/Models.swift)."""

    audio: np.ndarray
    sample_rate: int = OUTPUT_SAMPLE_RATE
    timings: SpeechTimings = dataclasses.field(default_factory=SpeechTimings)
    text: str = ""

    @property
    def duration_seconds(self) -> float:
        return len(self.audio) / self.sample_rate

    def save(self, path: Union[str, Path]) -> Path:
        from whisperkit_tpu.audio.output import save_audio

        return save_audio(self.audio, path, self.sample_rate)


class TextChunker:
    """Sentence-boundary chunking (reference: TextChunker.swift:71)."""

    _SENT = re.compile(r"(?<=[.!?。！？])\s+")

    def chunk(self, text: str, target: int = 200, minimum: int = 40) -> list[str]:
        text = text.strip()
        if len(text) <= target:
            return [text] if text else []
        sentences = self._SENT.split(text)
        chunks: list[str] = []
        cur = ""
        for s in sentences:
            if cur and len(cur) + 1 + len(s) > target:
                chunks.append(cur)
                cur = s
            else:
                cur = f"{cur} {s}".strip()
        if cur:
            if chunks and len(cur) < minimum:
                chunks[-1] = f"{chunks[-1]} {cur}"
            else:
                chunks.append(cur)
        return chunks


class HFTTSTokenizer:
    """Qwen BPE via a checkpoint's tokenizer.json (the `tokenizers` lib).

    Reference: TTSTokenizer.swift:10-45 + the vendored Qwen tokenizer.
    Speaker/language control tokens resolve through added special tokens
    (`<|voice:NAME|>`, `<|lang:NAME|>`) and fall back to reserved rows.
    """

    def __init__(self, tokenizer_json: Union[str, Path], vocab_size: int):
        from tokenizers import Tokenizer

        self.tok = Tokenizer.from_file(str(tokenizer_json))
        self.vocab_size = vocab_size

    def encode(self, text: str) -> list[int]:
        return [t for t in self.tok.encode(text).ids if t < self.vocab_size]


class ByteFallbackTokenizer:
    """Offline text tokenizer: UTF-8 bytes (+reserved control rows).

    Real Qwen BPE loads from a checkpoint's tokenizer.json when present
    (reference vendors the Qwen tokenizer; TTSTokenizer.swift:10-45).
    Speaker/language control ids are CODEC-track tokens (Qwen3Models.swift)
    resolved by the pipeline, not text tokens.
    """

    RESERVED = 64  # rows reserved for control tokens

    def __init__(self, vocab_size: int):
        self.vocab_size = vocab_size

    def encode(self, text: str) -> list[int]:
        return [
            self.RESERVED + b
            for b in text.encode("utf-8")
            if self.RESERVED + b < self.vocab_size
        ]


class TTSPromptCache:
    """Voice/language/instruction-keyed prefill KV snapshots.

    Reference: PromptCache.swift:24-149 (`matches`, save/load to disk).
    """

    def __init__(self):
        self._cache: dict[tuple, tuple] = {}

    @staticmethod
    def key(voice, language, instruction) -> tuple:
        return (voice or "", language or "", instruction or "")

    def get(self, voice, language, instruction):
        return self._cache.get(self.key(voice, language, instruction))

    def put(self, voice, language, instruction, kv, prompt_len: int) -> None:
        self._cache[self.key(voice, language, instruction)] = (kv, prompt_len)

    def save(self, path: Union[str, Path]) -> None:
        path = Path(path)
        blobs = {}
        meta = []
        for i, (key, (kv, plen)) in enumerate(self._cache.items()):
            blobs[f"k{i}"] = np.asarray(kv[0], np.float32)
            blobs[f"v{i}"] = np.asarray(kv[1], np.float32)
            meta.append({"key": list(key), "prompt_len": plen})
        np.savez_compressed(path, meta=np.asarray(meta, dtype=object), **blobs)

    def load(self, path: Union[str, Path]) -> None:
        data = np.load(path, allow_pickle=True)
        for i, m in enumerate(data["meta"]):
            kv = (
                jnp.asarray(data[f"k{i}"], jnp.bfloat16),
                jnp.asarray(data[f"v{i}"], jnp.bfloat16),
            )
            self._cache[tuple(m["key"])] = (kv, int(m["prompt_len"]))


class TTSPipeline:
    """Reference: the `TTSKit` class."""

    def __init__(
        self,
        dims: Qwen3TTSDims = TINY_TTS_DIMS,
        *,
        params=None,
        tokenizer=None,
        seed: int = 0,
        quantize: Union[bool, str] = False,
    ):
        self.dims = dims
        self.params = (
            params
            if params is not None
            else init_tts_params(jax.random.PRNGKey(seed), dims)
        )
        if quantize:
            # quantize=True/"w8a16" → W8A16 (reference ships quantized TTS
            # components, Qwen3Config.swift:106-112); "w4a16" → group-wise
            # int4 (the 4-bit palettized-variant analog, ops/quant.py)
            if quantize not in (True, "w8a16", "w4a16"):
                raise ValueError(f"unknown quantization scheme: {quantize!r}")
            from whisperkit_tpu.ops.quant import quantize_tts_params

            self.params = quantize_tts_params(
                self.params, bits=4 if quantize == "w4a16" else 8
            )
        self.tokenizer = tokenizer or ByteFallbackTokenizer(dims.text_vocab)
        self.prompt_cache = TTSPromptCache()
        self.chunker = TextChunker()
        self.timings = SpeechTimings()
        self._mesh_plan = None  # lazily built when >1 device is visible

    def _mesh(self):
        """Data-parallel mesh: sentence-chunk rows shard over ICI, params
        replicate (SURVEY.md §2.6 — the reference's concurrent chunk
        TaskGroups become a sharded batch dim)."""
        if self._mesh_plan is None:
            n = len(jax.devices())
            if n <= 1:
                self._mesh_plan = False
            else:
                from whisperkit_tpu.parallel.mesh import (
                    make_mesh,
                    shard_params_replicated,
                )

                self._mesh_plan = make_mesh(dp=n)
                self.params = shard_params_replicated(self._mesh_plan, self.params)
        return self._mesh_plan or None

    @classmethod
    def from_pretrained(cls, model_folder: Optional[str] = None, **kwargs):
        if model_folder:
            folder = Path(model_folder)
            if (folder / "config.json").exists() and any(folder.glob("*.safetensors")):
                from whisperkit_tpu.models.qwen3_loader import load_qwen3_tts

                dims, params = load_qwen3_tts(folder)
                tokenizer = None
                if (folder / "tokenizer.json").exists():
                    try:
                        tokenizer = HFTTSTokenizer(
                            folder / "tokenizer.json", dims.text_vocab
                        )
                    except Exception as e:
                        logging.error(f"tokenizer.json load failed: {e}")
                return cls(dims, params=params, tokenizer=tokenizer, **kwargs)
            npz = folder / "qwen3_tts.npz"
            if npz.exists():
                data = np.load(npz, allow_pickle=True)
                return cls(params=data["params"].item(), **kwargs)
            logging.error(f"no TTS params in {model_folder}; using random init")
        return cls(**kwargs)

    # -- prompt building ----------------------------------------------------
    #
    # The prompt is DUAL-TRACK (Qwen3GenerateTask.swift:683-744
    # `buildCombinedEmbeddings`): every position is a text-track embedding
    # plus a codec-track embedding. Layout per chunk:
    #
    #   [instr tokens]           text: "<|im_start|>user\n{i}<|im_end|>\n"   codec: —
    #   [role tokens]            text: "<|im_start|>assistant\n"             codec: —
    #   [5 control positions]    text: textPAD x5                            codec: think, thinkBos, <lang>, thinkEos, <speaker>
    #   [1 position]             text: textBOS                               codec: codecPAD
    #   [1 variable position]    text: first text token                      codec: codecBOS
    #
    # The remaining text tokens feed ONE PER FRAME during generation
    # (trailing_text). Everything except the variable position is the
    # prompt-cacheable invariant prefix (buildPromptCache :746-790).

    _ROLE_PREFIX = "<|im_start|>assistant\n"

    def _speaker_id(self, voice: Optional[str]) -> int:
        v = (voice or DEFAULT_SPEAKER).lower()
        if v not in SPEAKERS:
            logging.error(f"unknown voice {v!r}; falling back to {DEFAULT_SPEAKER}")
        return SPEAKERS.get(v, SPEAKERS[DEFAULT_SPEAKER])

    def _language_id(self, language: Optional[str]) -> int:
        lang = (language or DEFAULT_TTS_LANGUAGE).lower()
        return TTS_LANGUAGES.get(lang, TTS_LANGUAGES[DEFAULT_TTS_LANGUAGE])

    def _chunk_tracks(
        self, text: str, options: GenerationOptions
    ) -> tuple[list[int], list[int], list[int], int]:
        """→ (text_track, codec_track with -1 = no codec embed,
        trailing_text, step_cap) for one chunk."""
        d = self.dims
        text_ids = self.tokenizer.encode(text) or [d.text_pad]
        role_ids = self.tokenizer.encode(self._ROLE_PREFIX)
        instr_ids = (
            self.tokenizer.encode(
                f"<|im_start|>user\n{options.instruction}<|im_end|>\n"
            )
            if options.instruction
            else []
        )
        codec_ids = [
            CODEC_THINK, CODEC_THINK_BOS, self._language_id(options.language),
            CODEC_THINK_EOS, self._speaker_id(options.voice), CODEC_PAD,
            CODEC_BOS,
        ]
        text_track = (
            instr_ids + role_ids + [d.text_pad] * (len(codec_ids) - 2)
            + [d.text_bos, text_ids[0]]
        )
        codec_track = [-1] * (len(instr_ids) + len(role_ids)) + codec_ids
        # 8x prompt-size frame budget (Qwen3GenerateTask.swift:358-370)
        step_cap = 8 * (len(role_ids) + len(text_ids))
        return text_track, codec_track, text_ids[1:], step_cap

    def _embed_tracks(
        self, rows: list[tuple[list[int], list[int]]]
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Left-pad heterogeneous (text, codec) rows; returns (embeds
        [B,P,D], pad counts [B]) — pads are masked from attention by the
        generation loop."""
        max_len = max(len(t) for t, _ in rows)
        text = np.full((len(rows), max_len), self.dims.text_pad, np.int32)
        codec = np.full((len(rows), max_len), -1, np.int32)
        pads = np.zeros(len(rows), np.int32)
        for i, (t, c) in enumerate(rows):
            text[i, max_len - len(t):] = t
            codec[i, max_len - len(c):] = c
            pads[i] = max_len - len(t)
        temb = self.params["text_embed"][jnp.asarray(text)]
        cemb = jnp.where(
            jnp.asarray(codec >= 0)[:, :, None],
            self.params["code_embed"][jnp.asarray(np.maximum(codec, 0))],
            0,
        )
        return temb + cemb, jnp.asarray(pads)

    def _trailing_array(self, rows: list[list[int]]) -> jnp.ndarray:
        """Pad trailing text tokens with textPAD (+1 guaranteed PAD col)."""
        tt = max((len(r) for r in rows), default=0) + 1
        arr = np.full((len(rows), tt), self.dims.text_pad, np.int32)
        for i, r in enumerate(rows):
            arr[i, : len(r)] = r
        return jnp.asarray(arr)

    # -- generation ---------------------------------------------------------

    def generate(
        self,
        text: str,
        options: Optional[GenerationOptions] = None,
        progress=None,
    ) -> SpeechResult:
        """Synthesize `text` → 24 kHz waveform.

        Reference: TTSKit.generate (:760-972) — sentence chunks, ordered
        delivery, equal-power crossfade. Chunks run as ONE batched AR
        decode (the reference's concurrent TaskGroups become the batch dim).
        """
        options = options or GenerationOptions()
        t_start = time.perf_counter()
        timings = SpeechTimings()
        self.timings = timings

        t0 = time.perf_counter()
        chunks = (
            self.chunker.chunk(text, options.target_chunk_size, options.min_chunk_size)
            if options.chunking_strategy == "sentence"
            else [text]
        )
        if not chunks:
            return SpeechResult(audio=np.zeros(0, np.float32), text=text)

        # prompt-cache hit: prefix KV is restored instead of re-prefilled
        cached_kv, cached_len = None, 0
        if options.use_prompt_cache:
            hit = self.prompt_cache.get(
                options.voice, options.language, options.instruction
            )
            if hit is not None:
                cached_kv, cached_len = hit
        tracks = [self._chunk_tracks(c, options) for c in chunks]
        if cached_len:
            # invariant prefix restored from KV: only the variable position
            # (first text token + codecBOS) prefills per chunk
            rows = [(t[-1:], c[-1:]) for t, c, _, _ in tracks]
        else:
            rows = [(t, c) for t, c, _, _ in tracks]
        trailing_rows = [tr for _, _, tr, _ in tracks]
        caps = [cap for _, _, _, cap in tracks]
        # multi-chip: pad the chunk rows to a dp multiple (the duplicates
        # generate in parallel and are dropped at delivery) and shard
        plan = self._mesh()
        if plan is not None:
            padded_rows = plan.pad_batch(len(rows))
            rows = rows + [rows[-1]] * (padded_rows - len(rows))
            trailing_rows = trailing_rows + [trailing_rows[-1]] * (
                padded_rows - len(trailing_rows)
            )
            caps = caps + [caps[-1]] * (padded_rows - len(caps))
        prompt_embeds, prompt_pad = self._embed_tracks(rows)
        trailing_text = self._trailing_array(trailing_rows)
        step_cap = jnp.asarray(caps, jnp.int32)
        if plan is not None:
            from whisperkit_tpu.parallel.mesh import shard_batch

            prompt_embeds = shard_batch(plan, prompt_embeds)
            prompt_pad = shard_batch(plan, prompt_pad)
            trailing_text = shard_batch(plan, trailing_text)
            step_cap = shard_batch(plan, step_cap)
        timings.tokenize_seconds = time.perf_counter() - t0
        timings.chunks = len(chunks)

        t0 = time.perf_counter()
        scalars = TTSScalars(
            temperature=jnp.float32(options.temperature),
            repetition_penalty=jnp.float32(options.repetition_penalty),
            rng_key=jax.random.PRNGKey(options.seed),
        )
        out = tts_generate_loop(
            self.params,
            prompt_embeds,
            scalars,
            dims=self.dims,
            max_new_tokens=options.max_new_tokens,
            top_k=options.top_k,
            cached_kv=cached_kv,
            cached_len=cached_len,
            prompt_pad=prompt_pad,
            trailing_text=trailing_text,
            step_cap=step_cap,
        )
        codes = np.asarray(out.codes)
        n_frames = np.asarray(out.n_frames)
        timings.generate_seconds = time.perf_counter() - t0
        timings.frames = int(n_frames.sum())
        if progress:
            progress(0.8)

        # vocoder: one batched call over all chunks
        t0 = time.perf_counter()
        waves = np.asarray(
            speech_decoder_forward(self.params, jnp.asarray(codes), self.dims)
        )  # [B, MAX*1920]
        timings.vocode_seconds = time.perf_counter() - t0
        # first audible buffer exists once generation+vocode of chunk 0 done
        timings.time_to_first_buffer = time.perf_counter() - t_start

        # ordered delivery + crossfade (reference :868-941)
        pieces = [
            waves[i, : int(n_frames[i]) * SAMPLES_PER_FRAME]
            for i in range(len(chunks))
        ]
        audio = crossfade(pieces, OUTPUT_SAMPLE_RATE, options.crossfade_seconds)
        timings.total_seconds = time.perf_counter() - t_start
        if progress:
            progress(1.0)
        return SpeechResult(audio=audio, timings=timings, text=text)

    # -- prompt cache -------------------------------------------------------

    def build_prompt_cache(self, options: GenerationOptions) -> None:
        """Prefill the invariant prefix (instruction + role + control
        tokens; everything except the variable firstText+codecBOS position)
        once and snapshot its KV (reference: TTSKit.swift:609-683,
        Qwen3GenerateTask.swift:746-790 dropLast)."""
        text_track, codec_track, _, _ = self._chunk_tracks("", options)
        rows = [(text_track[:-1], codec_track[:-1])]
        embeds, _ = self._embed_tracks(rows)
        plen = embeds.shape[1]
        kv = tts_prefill(self.params, embeds, dims=self.dims, max_seq=plen)
        self.prompt_cache.put(
            options.voice, options.language, options.instruction, kv, plen
        )

    # -- streaming playback -------------------------------------------------

    def play(
        self,
        text: str,
        options: Optional[GenerationOptions] = None,
        strategy: PlaybackStrategy = PlaybackStrategy.AUTO,
        output_path: Optional[Union[str, Path]] = None,
    ) -> SpeechResult:
        """Reference: TTSKit.play (:994-1063). GENERATE_FIRST (and file
        output) synthesize everything up front; the other strategies stream
        through the chunk-scheduled playback engine. On hosts without audio
        hardware the synthesized waveform is written to `output_path`."""
        if output_path is not None or strategy == PlaybackStrategy.GENERATE_FIRST:
            result = self.generate(text, options)
            if output_path is not None:
                result.save(output_path)
                return result
            from whisperkit_tpu.audio.output import play as _play

            _play(result.audio, result.sample_rate)
            return result
        engine, thread = self.play_streaming(text, options, strategy)
        engine.play_blocking()
        thread.join()
        return SpeechResult(
            audio=np.zeros(0, np.float32),  # streamed to the device
            sample_rate=OUTPUT_SAMPLE_RATE,
            text=text,
            timings=self.timings,
        )

    def play_streaming(
        self,
        text: str,
        options: Optional[GenerationOptions] = None,
        strategy: PlaybackStrategy = PlaybackStrategy.AUTO,
        engine=None,
        block_frames: int = 25,
    ):
        """Start non-blocking streamed synthesis into a
        StreamingAudioOutput engine (reference: AudioOutput.swift:38-700
        chunk scheduling + TTSKit.swift:994-1063 `.auto` sizing from the
        first measured step). Returns (engine, producer_thread); the caller
        pulls from the engine (hardware callback or test sink)."""
        import threading

        from whisperkit_tpu.audio.output import StreamingAudioOutput

        if engine is None:
            engine = StreamingAudioOutput(OUTPUT_SAMPLE_RATE, strategy)

        def produce():
            t0 = time.perf_counter()
            first = True
            try:
                for block in self.stream_blocks(text, options, block_frames):
                    if first:
                        dt = time.perf_counter() - t0
                        n_frames = max(1, len(block) // SAMPLES_PER_FRAME)
                        engine.set_measured_step(
                            dt / n_frames, SAMPLES_PER_FRAME / OUTPUT_SAMPLE_RATE
                        )
                        first = False
                    engine.enqueue(block)
            finally:
                engine.finish()

        thread = threading.Thread(target=produce, daemon=True)
        thread.start()
        return engine, thread

    def stream_blocks(
        self,
        text: str,
        options: Optional[GenerationOptions] = None,
        block_frames: int = 25,  # 2 s blocks at 12.5 Hz
    ) -> Iterator[np.ndarray]:
        """TRUE block-streaming synthesis: the AR loop runs in resumable
        segments (decoding/tts_loop.tts_generate_segment) and each block is
        vocoded+yielded as soon as its codes exist — time-to-first-buffer is
        one prefill + one short segment, not the whole utterance
        (reference: `.stream` PlaybackStrategy, TTSKit.swift:994-1063).
        The vocoder streams through a Code2WavCache (transformer KV +
        rolling 16-frame hidden context — the reference SpeechDecoderCache,
        KVCache.swift:159-210), sample-exact vs whole-utterance decoding.

        Streams the text as ONE chunk (batch 1)."""
        from whisperkit_tpu.decoding.tts_loop import (
            tts_generate_segment,
            tts_prefill_state,
        )
        from whisperkit_tpu.models.qwen3_tts import (
            C2W_CONTEXT_FRAMES,
            CODEC_EOS,
            code2wav_decode_block,
            init_code2wav_cache,
        )

        options = options or GenerationOptions()
        # ctx_frames is a static jit arg taking values {0, C2W_CONTEXT_FRAMES}
        # only when blocks are at least one full context long; smaller blocks
        # would compile a fresh vocoder shape per ramp-up step (ADVICE r2 #4)
        block_frames = max(block_frames, C2W_CONTEXT_FRAMES)
        text_track, codec_track, trailing, cap = self._chunk_tracks(text, options)
        embeds, pad = self._embed_tracks([(text_track, codec_track)])
        trailing_text = self._trailing_array([trailing])
        step_cap = jnp.asarray([min(cap, options.max_new_tokens)], jnp.int32)
        # +block_frames headroom: the final segment may overrun max_new
        # before its done-mask settles
        max_seq = len(text_track) + options.max_new_tokens + 1 + block_frames
        state = tts_prefill_state(
            self.params, embeds, trailing_text, step_cap,
            jax.random.PRNGKey(options.seed),
            dims=self.dims, max_seq=max_seq, prompt_pad=pad,
        )
        scalars = TTSScalars(
            temperature=jnp.float32(options.temperature),
            repetition_penalty=jnp.float32(options.repetition_penalty),
            rng_key=jax.random.PRNGKey(options.seed),
        )
        voc_cache = init_code2wav_cache(
            self.dims.c2w, 1,
            max_frames=options.max_new_tokens + block_frames,
            dtype=self.params["c2w"]["ln_f"].dtype,
        )
        produced = 0
        while produced < options.max_new_tokens:
            n = min(block_frames, options.max_new_tokens - produced)
            codes, state = tts_generate_segment(
                self.params, state, scalars, dims=self.dims,
                n_frames=block_frames, top_k=options.top_k,
            )
            codes_np = np.asarray(codes)[:, :n]
            valid = int((codes_np[0, :, 0] != CODEC_EOS).sum())
            if valid == 0:
                break
            wave, voc_cache = code2wav_decode_block(
                self.params["c2w"], jnp.asarray(codes_np[:, :valid]),
                voc_cache, self.dims.c2w,
                ctx_frames=min(produced, C2W_CONTEXT_FRAMES),
            )
            yield np.asarray(wave)[0]
            produced += valid
            if bool(np.asarray(state.done).all()) or valid < n:
                break


# Variant presets (reference: Qwen3Config.swift:25-83 — 0.6b all-platform,
# 1.7b with instruction support).
TTS_VARIANTS: dict[str, Qwen3TTSDims] = {
    "0.6b": Qwen3TTSDims(),
    "1.7b": Qwen3TTSDims(d_model=2048, n_layer=28, n_head=16, n_kv_head=8, d_ff=6144),
    "tiny-test": TINY_TTS_DIMS,
}
