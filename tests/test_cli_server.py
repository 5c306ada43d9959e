"""CLI argument surface + OpenAI-compatible server.

Reference test model: ServeCLI/OpenAIHandler behavior and the
TranscribeCLI flag surface.
"""

import json
import wave

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from whisperkit_tpu.cli.main import build_parser
from whisperkit_tpu.models.whisper import WhisperDims, init_params
from whisperkit_tpu.pipelines.whisper import WhisperPipeline

DIMS = WhisperDims(80, 207, 1500, 64, 4, 2, 64, 64, 4, 2)


def _write_wav(path, samples, rate=16000):
    pcm = (np.clip(samples, -1, 1) * 32767).astype(np.int16)
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm.tobytes())


@pytest.fixture(scope="module")
def pipe():
    return WhisperPipeline(dims=DIMS, params=init_params(jax.random.PRNGKey(0), DIMS))


# -- CLI parsing ------------------------------------------------------------


def test_cli_transcribe_flags():
    args = build_parser().parse_args(
        [
            "transcribe", "--audio-path", "a.wav", "b.wav",
            "--language", "en", "--word-timestamps", "--beam-size", "3",
            "--chunking-strategy", "vad", "--report", "--report-format", "srt", "vtt",
        ]
    )
    assert args.command == "transcribe"
    assert args.audio_path == ["a.wav", "b.wav"]
    assert args.beam_size == 3
    assert args.report_format == ["srt", "vtt"]


def test_cli_all_subcommands_parse():
    p = build_parser()
    assert p.parse_args(["diarize", "--audio-path", "x.wav"]).command == "diarize"
    assert p.parse_args(["tts", "--text", "hi"]).command == "tts"
    assert p.parse_args(["serve", "--port", "8080"]).port == 8080


def test_cli_rejects_unknown_command():
    with pytest.raises(SystemExit):
        build_parser().parse_args(["frobnicate"])


# -- server -----------------------------------------------------------------


@pytest.fixture()
def wav_bytes():
    rng = np.random.default_rng(0)
    import io

    buf = io.BytesIO()
    pcm = (rng.standard_normal(16000 * 2) * 0.1 * 32767).astype(np.int16)
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


async def _request(app, path, data):
    from aiohttp.test_utils import TestClient, TestServer

    async with TestClient(TestServer(app)) as client:
        return await client.post(path, data=data), client


def test_server_health(pipe):
    import asyncio

    from aiohttp.test_utils import TestClient, TestServer

    from whisperkit_tpu.server.openai_api import create_app

    async def go():
        app = create_app(pipe)
        async with TestClient(TestServer(app)) as client:
            resp = await client.get("/health")
            assert resp.status == 200
            data = await resp.json()
            assert data["status"] == "ok"

    asyncio.run(go())


def test_server_transcription_json(pipe, wav_bytes):
    import asyncio

    import aiohttp
    from aiohttp.test_utils import TestClient, TestServer

    from whisperkit_tpu.server.openai_api import create_app

    async def go():
        app = create_app(pipe)
        async with TestClient(TestServer(app)) as client:
            form = aiohttp.FormData()
            form.add_field("file", wav_bytes, filename="test.wav",
                           content_type="audio/wav")
            form.add_field("language", "en")
            form.add_field("response_format", "verbose_json")
            resp = await client.post("/v1/audio/transcriptions", data=form)
            assert resp.status == 200
            data = await resp.json()
            assert "text" in data and "segments" in data
            assert data["language"] == "en"

    asyncio.run(go())


def test_server_missing_file_400(pipe):
    import asyncio

    import aiohttp
    from aiohttp.test_utils import TestClient, TestServer

    from whisperkit_tpu.server.openai_api import create_app

    async def go():
        app = create_app(pipe)
        async with TestClient(TestServer(app)) as client:
            form = aiohttp.FormData()
            form.add_field("language", "en")
            resp = await client.post("/v1/audio/transcriptions", data=form)
            assert resp.status == 400

    asyncio.run(go())


def test_server_streaming_sse(pipe, wav_bytes):
    import asyncio

    import aiohttp
    from aiohttp.test_utils import TestClient, TestServer

    from whisperkit_tpu.server.openai_api import create_app

    async def go():
        app = create_app(pipe)
        async with TestClient(TestServer(app)) as client:
            form = aiohttp.FormData()
            form.add_field("file", wav_bytes, filename="t.wav",
                           content_type="audio/wav")
            form.add_field("language", "en")
            form.add_field("stream", "true")
            resp = await client.post("/v1/audio/transcriptions", data=form)
            assert resp.status == 200
            body = await resp.text()
            assert "transcript.text.done" in body
            assert "[DONE]" in body

    asyncio.run(go())


def test_cli_transcribe_end_to_end(tmp_path, pipe, monkeypatch, capsys):
    """Drive cmd_transcribe with a patched pipeline builder."""
    from whisperkit_tpu.cli import main as cli_main

    rng = np.random.default_rng(1)
    wav = tmp_path / "clip.wav"
    _write_wav(wav, rng.standard_normal(16000 * 2) * 0.1)
    monkeypatch.setattr(cli_main, "_build_pipeline", lambda args: pipe)

    rc = cli_main.main(
        [
            "transcribe", "--audio-path", str(wav), "--language", "en",
            "--sample-length", "6", "--report", "--report-path", str(tmp_path),
            "--report-format", "json", "srt",
        ]
    )
    assert rc == 0
    assert (tmp_path / "clip.json").exists()
    assert (tmp_path / "clip.srt").exists()
    data = json.loads((tmp_path / "clip.json").read_text())
    assert "segments" in data


def test_cli_build_pipeline_with_draft_model(tmp_path):
    """--draft-model-folder loads a second checkpoint and arms the
    batch-1 speculative path (decoding/speculative.py)."""
    import argparse

    torch = pytest.importorskip("torch")
    from transformers import WhisperConfig as HFWhisperConfig
    from transformers import WhisperForConditionalGeneration

    cfg = dict(
        vocab_size=207, num_mel_bins=80, d_model=64, encoder_layers=2,
        encoder_attention_heads=4, decoder_layers=2,
        decoder_attention_heads=4, encoder_ffn_dim=256, decoder_ffn_dim=256,
        max_source_positions=150, max_target_positions=64, pad_token_id=0,
        bos_token_id=1, eos_token_id=2, decoder_start_token_id=3,
        suppress_tokens=[], begin_suppress_tokens=[],
    )
    for name, seed in (("target", 0), ("draft", 1)):
        torch.manual_seed(seed)
        WhisperForConditionalGeneration(
            HFWhisperConfig(**cfg)
        ).save_pretrained(tmp_path / name, safe_serialization=True)

    from whisperkit_tpu.cli import main as cli_main

    args = argparse.Namespace(
        model=None, model_repo=None, model_folder=str(tmp_path / "target"),
        tokenizer_folder=None, download=False, prewarm=False, verbose=False,
        draft_model_folder=str(tmp_path / "draft"),
    )
    built = cli_main._build_pipeline(args)
    assert built.draft_params is not None
    assert built.draft_dims.n_vocab == built.dims.n_vocab


def test_cli_diarization_combo(tmp_path, pipe, monkeypatch, capsys):
    """--diarization merges speaker labels into the transcript output."""
    from whisperkit_tpu.cli import main as cli_main
    from whisperkit_tpu.speaker.results import DiarizationResult, SpeakerSegment

    rng = np.random.default_rng(2)
    wavp = tmp_path / "d.wav"
    _write_wav(wavp, rng.standard_normal(16000 * 3) * 0.1)
    monkeypatch.setattr(cli_main, "_build_pipeline", lambda args: pipe)

    class FakeDia:
        def diarize(self, path):
            return DiarizationResult(
                segments=[SpeakerSegment(0, 0.0, 30.0)], num_speakers=1
            )

        @classmethod
        def from_pretrained(cls, model_folder=None, **kw):
            return cls()

    import whisperkit_tpu.pipelines.diarize as dz

    monkeypatch.setattr(dz, "DiarizePipeline", FakeDia)
    rc = cli_main.main(
        ["transcribe", "--audio-path", str(wavp), "--language", "en",
         "--sample-length", "6", "--diarization"]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "SPEAKER_00" in out


def test_server_responses_match_schema(pipe, wav_bytes):
    """Responses validate against the pydantic OpenAI Audio API schema
    (the reference's generated OpenAPI types, Server/GeneratedSources)."""
    import asyncio

    import aiohttp
    from aiohttp.test_utils import TestClient, TestServer

    from whisperkit_tpu.server.openai_api import create_app
    from whisperkit_tpu.server.schema import (
        HealthResponse,
        TranscriptionResponse,
        VerboseTranscriptionResponse,
    )

    async def go():
        app = create_app(pipe, batching=True, max_batch=4)
        async with TestClient(TestServer(app)) as client:
            h = await client.get("/health")
            HealthResponse.model_validate(await h.json())

            for fmt, model in (
                ("json", TranscriptionResponse),
                ("verbose_json", VerboseTranscriptionResponse),
            ):
                form = aiohttp.FormData()
                form.add_field("file", wav_bytes, filename="x.wav",
                               content_type="audio/wav")
                form.add_field("language", "en")
                form.add_field("response_format", fmt)
                if fmt == "verbose_json":
                    form.add_field("timestamp_granularities[]", "word")
                r = await client.post("/v1/audio/transcriptions", data=form)
                assert r.status == 200
                model.model_validate(await r.json())

    asyncio.run(go())


async def _post_multipart(client, url, fields, audio_bytes, fname="a.wav"):
    import aiohttp

    data = aiohttp.FormData()
    for k, v in fields.items():
        data.add_field(k, v)
    data.add_field("file", audio_bytes, filename=fname)
    return await client.post(url, data=data)


def test_server_translations_task_reflected_and_rate_limit(tmp_path):
    """verbose_json reflects task=translate; saturating the concurrency
    limiter returns 429 (ROADMAP server items)."""
    import asyncio
    import io
    import wave

    import numpy as np
    import pytest as _pytest

    aiohttp = _pytest.importorskip("aiohttp")
    from aiohttp.test_utils import TestClient, TestServer

    jax = _pytest.importorskip("jax")
    from whisperkit_tpu.models.whisper import WhisperDims, init_params
    from whisperkit_tpu.pipelines.whisper import WhisperPipeline
    from whisperkit_tpu.server.openai_api import create_app

    dims = WhisperDims(80, 207, 1500, 64, 4, 2, 64, 64, 4, 2)
    pipe = WhisperPipeline(dims=dims, params=init_params(jax.random.PRNGKey(0), dims))

    buf = io.BytesIO()
    pcm = (np.random.RandomState(0).randn(16000) * 0.1 * 32767).astype(np.int16)
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(pcm.tobytes())
    wav_bytes = buf.getvalue()

    async def run():
        app = create_app(pipe, batching=False, max_concurrent_requests=1)
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            resp = await _post_multipart(
                client, "/v1/audio/translations",
                {"model": "whisper-1", "response_format": "verbose_json"},
                wav_bytes,
            )
            assert resp.status == 200
            payload = await resp.json()
            assert payload["task"] == "translate"

            # saturate the single slot with a slow request, expect 429 next
            t1 = asyncio.create_task(
                _post_multipart(
                    client, "/v1/audio/transcriptions",
                    {"model": "whisper-1"}, wav_bytes,
                )
            )
            await asyncio.sleep(0.15)  # let t1 claim the semaphore
            r2 = await _post_multipart(
                client, "/v1/audio/transcriptions",
                {"model": "whisper-1"}, wav_bytes,
            )
            assert r2.status == 429
            body = await r2.json()
            assert body["error"]["type"] == "rate_limit_exceeded"
            r1 = await t1
            assert r1.status == 200
            # health stays reachable even at saturation
            h = await client.get("/health")
            assert h.status == 200
        finally:
            await client.close()

    asyncio.run(run())


def test_device_probe_ok_and_timeout(monkeypatch):
    """probe_backend: succeeds against this host's CPU backend; reports a
    timeout (not a hang) when backend init stalls — the failure mode of an
    unreachable remote accelerator."""
    from whisperkit_tpu.core import device_probe

    # force the child to the CPU platform (the env's sitecustomize would
    # otherwise aim it at a remote TPU whose tunnel may be down)
    monkeypatch.setattr(
        device_probe, "_PROBE_CODE",
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        "d = jax.devices(); print(d[0].platform, len(d))",
    )
    res = device_probe.probe_backend(timeout_s=120)
    assert res.ok, res.message
    assert res.message.startswith("cpu")

    monkeypatch.setattr(
        device_probe, "_PROBE_CODE", "import time; time.sleep(60)"
    )
    res = device_probe.probe_backend(timeout_s=1.0)
    assert not res.ok
    assert "did not initialize" in res.message


def test_cli_serve_fails_fast_on_dead_device(monkeypatch, capsys):
    """`serve` exits 1 with a clear message instead of hanging when the
    device probe fails."""
    from whisperkit_tpu.cli import main as cli_main
    from whisperkit_tpu.core import device_probe

    monkeypatch.setattr(
        device_probe, "_PROBE_CODE", "import time; time.sleep(60)"
    )
    # the test process runs explicitly on CPU (conftest), which normally
    # SKIPS the probe — force the non-cpu decision to exercise the path
    monkeypatch.setattr(cli_main, "_explicit_cpu", lambda: False)
    rc = cli_main.main([
        "serve", "--model-folder", "/nonexistent",
        "--device-probe-timeout", "1",
    ])
    assert rc == 1
    assert "device probe failed" in capsys.readouterr().err


def test_cli_probe_skipped_on_explicit_cpu(monkeypatch):
    """A pure-CPU process (env or config override) must NOT pay or fail
    the default-backend probe."""
    from whisperkit_tpu.cli import main as cli_main
    from whisperkit_tpu.core import device_probe

    def boom(_timeout):
        raise AssertionError("probe must not run on explicit-CPU processes")

    monkeypatch.setattr(device_probe, "probe_backend", boom)
    import argparse

    args = argparse.Namespace(device_probe_timeout=90.0)
    # conftest forces jax_platforms=cpu in this process → skip
    cli_main._probe_device_or_raise(args)


def test_server_priority_field(pipe, wav_bytes, monkeypatch):
    """The `priority` extension field reaches the scheduler: a "latency"
    request decodes alone at b=1 (and runs speculative when a draft is
    loaded — covered in test_scheduler); an invalid value is a 400."""
    import asyncio

    from aiohttp.test_utils import TestClient, TestServer

    from whisperkit_tpu.server.openai_api import create_app

    seen = []
    orig = type(pipe)._decode_with_fallback

    def spy(self, ck, cv, options, language, window_index):
        b = ck["q8"].shape[1] if isinstance(ck, dict) else ck.shape[1]
        seen.append((options.priority, b))
        return orig(self, ck, cv, options, language, window_index)

    monkeypatch.setattr(type(pipe), "_decode_with_fallback", spy)

    async def go():
        app = create_app(pipe, batching=True, max_batch=4)
        async with TestClient(TestServer(app)) as client:
            r = await _post_multipart(
                client, "/v1/audio/transcriptions",
                {"language": "en", "priority": "latency"}, wav_bytes,
            )
            assert r.status == 200
            r2 = await _post_multipart(
                client, "/v1/audio/transcriptions",
                {"language": "en", "priority": "bogus"}, wav_bytes,
            )
            assert r2.status == 400

    asyncio.run(go())
    assert ("latency", 1) in seen



@pytest.mark.parametrize("batching", [True, False])
def test_server_streaming_concurrent_requests(pipe, wav_bytes, batching):
    """Concurrent SSE requests must be safe: with batching on they ride the
    continuous batcher (the pipeline object is not thread-safe — per-request
    threads used to race it and the scheduler's collector); with batching
    off, direct pipeline use is serialized behind the server's lock."""
    import asyncio

    import aiohttp
    from aiohttp.test_utils import TestClient, TestServer

    from whisperkit_tpu.server.openai_api import create_app

    async def one(client):
        form = aiohttp.FormData()
        form.add_field("file", wav_bytes, filename="t.wav",
                       content_type="audio/wav")
        form.add_field("language", "en")
        form.add_field("stream", "true")
        resp = await client.post("/v1/audio/transcriptions", data=form)
        assert resp.status == 200
        return await resp.text()

    async def go():
        app = create_app(pipe, batching=batching, max_batch=4)
        async with TestClient(TestServer(app)) as client:
            bodies = await asyncio.gather(one(client), one(client), one(client))
            for body in bodies:
                assert "transcript.text.delta" in body
                assert "transcript.text.done" in body
                assert "[DONE]" in body

    asyncio.run(go())


def test_cli_tts_quantization_flag_reaches_pipeline(tmp_path, monkeypatch):
    """`tts --quantization w8a16` must build a quantized TTSPipeline (the
    flag used to be parsed but silently ignored for tts/diarize)."""
    from whisperkit_tpu.cli import main as cli_main
    from whisperkit_tpu.pipelines import tts as tts_mod

    seen = {}

    class FakeResult:
        duration_seconds = 1.0

        def save(self, path):
            seen["saved"] = path

    class FakeTTS:
        @classmethod
        def from_pretrained(cls, model_folder=None, **kw):
            seen.update(kw)
            return cls()

        def generate(self, text, options):
            return FakeResult()

    monkeypatch.setattr(tts_mod, "TTSPipeline", FakeTTS)
    out = tmp_path / "o.wav"
    rc = cli_main.main(
        ["tts", "--text", "hi", "--quantization", "w8a16",
         "--output-path", str(out)]
    )
    assert rc == 0
    assert seen["quantize"] == "w8a16"


def test_cli_diarize_quantization_flag(monkeypatch, capsys):
    """`diarize --quantization w8a16` selects the quantized speaker variant;
    w4a16 (not in the pyannote matrix) is a clean CLI error, not a
    traceback."""
    from whisperkit_tpu.cli import main as cli_main
    from whisperkit_tpu.pipelines import diarize as dz
    from whisperkit_tpu.speaker.results import DiarizationResult

    seen = {}

    class FakeDia:
        VARIANTS = dz.DiarizePipeline.VARIANTS

        @classmethod
        def from_pretrained(cls, model_folder=None, variant="w32a32", **kw):
            seen["variant"] = variant
            return cls()

        def diarize(self, path, options=None):
            return DiarizationResult(segments=[], num_speakers=0)

    monkeypatch.setattr(dz, "DiarizePipeline", FakeDia)
    rc = cli_main.main(
        ["diarize", "--audio-path", "x.wav", "--quantization", "w8a16"]
    )
    assert rc == 0
    assert seen["variant"] == "w8a16"

    rc = cli_main.main(
        ["diarize", "--audio-path", "x.wav", "--quantization", "w4a16"]
    )
    assert rc == 2
    assert "not available for diarization" in capsys.readouterr().err


def test_cli_tts_w8a8_rejected_cleanly(capsys):
    """w8a8 is a Whisper-encoder-only recipe: `tts --quantization w8a8`
    exits 2 with a message (not an uncaught TTSPipeline ValueError),
    mirroring the diarize command's handling (r4 advisor finding)."""
    from whisperkit_tpu.cli import main as cli_main

    rc = cli_main.main(["tts", "--text", "hi", "--quantization", "w8a8"])
    assert rc == 2
    assert "not available for tts" in capsys.readouterr().err
