"""OpenAI-compatible local HTTP server (Audio API).

Reference: Sources/ArgmaxCLI/ServeCLI.swift:26-63 +
Server/OpenAIHandler.swift (`createTranscription` :121, SSE streaming
:22-119), generated from scripts/specs/localserver_openapi.yaml. Endpoints:

  POST /v1/audio/transcriptions   multipart: file, model, language, prompt,
                                  temperature, response_format, stream,
                                  priority (extension: "latency" → b=1 +
                                  speculative when a draft is loaded),
                                  timestamp_granularities[]
  POST /v1/audio/translations     same minus language (task=translate)
  GET  /health

Substrate: aiohttp (the reference uses Vapor). Transcription runs in a
worker thread; SSE streaming forwards per-window progress as
`transcript.text.delta` events and finishes with `transcript.text.done`,
matching the OpenAI streaming event shapes.
"""

from __future__ import annotations

import asyncio
import json
import tempfile
import threading
from pathlib import Path
from typing import Optional

from whisperkit_tpu.core.configurations import DecodingOptions, DecodingTask
from whisperkit_tpu.core.logging import logging


def _result_payload(result, response_format: str, task: str = "transcribe"):
    from whisperkit_tpu.text.writers import WriteSRT, WriteVTT

    if response_format == "text":
        return result.text, "text/plain"
    if response_format == "srt":
        return WriteSRT().format(result), "text/plain"
    if response_format == "vtt":
        return WriteVTT().format(result), "text/plain"
    if response_format == "verbose_json":
        payload = {
            "task": task,
            "language": result.language,
            "duration": result.timings.input_audio_seconds,
            "text": result.text,
            "segments": [
                {
                    "id": s.id,
                    "seek": s.seek,
                    "start": s.start,
                    "end": s.end,
                    "text": s.text,
                    "tokens": s.tokens,
                    "temperature": s.temperature,
                    "avg_logprob": s.avg_logprob,
                    "compression_ratio": s.compression_ratio,
                    "no_speech_prob": s.no_speech_prob,
                }
                for s in result.segments
            ],
        }
        words = result.all_words
        if words:
            payload["words"] = [
                {"word": w.word, "start": w.start, "end": w.end} for w in words
            ]
        return json.dumps(payload), "application/json"
    # default: json
    return json.dumps({"text": result.text}), "application/json"


def create_app(
    pipeline,
    *,
    batching: bool = True,
    max_batch: int = 16,
    max_concurrent_requests: int = 64,
):
    """`batching=True` routes non-streaming requests through the continuous
    batcher so concurrent clients share one TPU decode
    (pipelines/scheduler.py). Requests beyond `max_concurrent_requests`
    in flight are rejected with 429 instead of queueing unboundedly."""
    from aiohttp import web

    # explicit in-flight counter: a Semaphore's locked()-then-acquire is a
    # check-then-act race — a burst arriving while one slot is free would all
    # pass the check and queue past the limit instead of getting 429. The
    # counter increments atomically (no await between test and increment),
    # so overload genuinely rejects instead of queueing.
    in_flight = 0

    @web.middleware
    async def rate_limit(request, handler):
        nonlocal in_flight
        if request.path == "/health":
            return await handler(request)
        if in_flight >= max_concurrent_requests:
            return web.json_response(
                {
                    "error": {
                        "message": "too many concurrent requests",
                        "type": "rate_limit_exceeded",
                    }
                },
                status=429,
            )
        in_flight += 1
        try:
            return await handler(request)
        finally:
            in_flight -= 1

    scheduler = None
    if batching:
        from whisperkit_tpu.pipelines.scheduler import BatchScheduler

        scheduler = BatchScheduler(pipeline, max_batch=max_batch)
    # The pipeline object is NOT thread-safe (timings, language cache, lazy
    # mesh — pipelines/scheduler.py serializes all its use on one collector
    # thread for the same reason). With batching on, every request routes
    # through the scheduler; with batching OFF, concurrent requests would
    # call pipeline.transcribe from multiple executor/worker threads, so
    # direct use is serialized here.
    pipeline_lock = threading.Lock()

    def _locked_transcribe(audio, options, callback=None):
        with pipeline_lock:
            return pipeline.transcribe(audio, options, callback)

    async def health(request):
        payload = {"status": "ok", "model_state": str(pipeline.model_state)}
        if scheduler is not None:
            payload["batches_run"] = scheduler.batches_run
            payload["jobs_run"] = scheduler.jobs_run
        return web.json_response(payload)

    async def _parse_multipart(request):
        reader = await request.multipart()
        fields: dict[str, str] = {}
        audio_path: Optional[Path] = None
        granularities: list[str] = []
        async for part in reader:
            name = part.name or ""
            if name == "file":
                suffix = Path(part.filename or "audio.wav").suffix or ".wav"
                tmp = tempfile.NamedTemporaryFile(suffix=suffix, delete=False)
                while True:
                    chunk = await part.read_chunk()
                    if not chunk:
                        break
                    tmp.write(chunk)
                tmp.close()
                audio_path = Path(tmp.name)
            elif name in ("timestamp_granularities[]", "timestamp_granularities"):
                granularities.append((await part.text()).strip())
            else:
                fields[name] = await part.text()
        return fields, audio_path, granularities

    def _options(fields, granularities, task) -> DecodingOptions:
        word_ts = "word" in granularities
        prompt = fields.get("prompt")
        prompt_tokens = (
            pipeline.tokenizer.encode(" " + prompt.strip()) if prompt else None
        )
        return DecodingOptions(
            task=task,
            language=fields.get("language"),
            temperature=float(fields.get("temperature", 0.0)),
            word_timestamps=word_ts,
            prompt_tokens=prompt_tokens,
            chunking_strategy="vad",
            # extension field (no OpenAI equivalent): "latency" requests
            # decode alone at batch 1 without waiting to batch — and run
            # the lossless speculative draft-verify loop when the server's
            # pipeline carries a draft model
            priority=fields.get("priority", "throughput"),
        )

    async def _handle(request, task: DecodingTask):
        try:
            fields, audio_path, granularities = await _parse_multipart(request)
        except (AssertionError, ValueError) as e:
            return web.json_response(
                {"error": {"message": f"expected multipart/form-data: {e}"}},
                status=400,
            )
        if audio_path is None:
            return web.json_response(
                {"error": {"message": "missing file field"}}, status=400
            )
        response_format = fields.get("response_format", "json")
        stream = fields.get("stream", "false").lower() in ("1", "true", "yes")
        loop = asyncio.get_running_loop()
        try:
            try:
                options = _options(fields, granularities, task)
            except (ValueError, TypeError) as e:
                return web.json_response(
                    {"error": {"message": f"invalid request field: {e}"}},
                    status=400,
                )
            if stream:
                # streaming owns the temp file (the worker thread may
                # outlive this handler)
                resp = await _handle_streaming(request, audio_path, options)
                audio_path = None
                return resp
            if scheduler is not None:
                from whisperkit_tpu.audio.io import load_audio

                audio = await loop.run_in_executor(None, load_audio, audio_path)
                result = await asyncio.wrap_future(
                    scheduler.submit(audio, options)
                )
            else:
                result = await loop.run_in_executor(
                    None, lambda: _locked_transcribe(audio_path, options)
                )
            body, ctype = _result_payload(result, response_format, task.value)
            return web.Response(text=body, content_type=ctype)
        except Exception as e:  # surface as OpenAI-style error object
            logging.error(f"transcription failed: {e}")
            return web.json_response({"error": {"message": str(e)}}, status=500)
        finally:
            if audio_path is not None:
                audio_path.unlink(missing_ok=True)

    async def _handle_streaming(request, audio_path, options):
        """SSE: one transcript.text.delta per decoded window, then done.

        Owns (and deletes) `audio_path`. A client disconnect sets a cancel
        flag that the per-window progress callback turns into an early stop
        (returning False), so the decode winds down instead of transcribing
        an abandoned request to completion.

        With batching on, the request rides the SAME continuous batcher as
        non-streaming traffic (scheduler progress callbacks emit the
        deltas) — streaming concurrency shares TPU batches instead of
        racing the non-thread-safe pipeline from per-request threads.
        """
        resp = web.StreamResponse(
            headers={
                "Content-Type": "text/event-stream",
                "Cache-Control": "no-cache",
                "Connection": "keep-alive",
            }
        )
        await resp.prepare(request)
        loop = asyncio.get_running_loop()
        queue: asyncio.Queue = asyncio.Queue()
        cancelled = threading.Event()

        if scheduler is not None:
            from whisperkit_tpu.audio.io import load_audio

            # the response is already prepared: a load failure must flow
            # through the SSE error event, not escape to _handle (which
            # would try to send a second response on this request)
            audio = None
            try:
                audio = await loop.run_in_executor(None, load_audio, audio_path)
            except Exception as e:  # noqa: BLE001 — forwarded as SSE error
                queue.put_nowait(("error", e))
            finally:
                audio_path.unlink(missing_ok=True)

            def window_callback(text: str):
                if cancelled.is_set():
                    return False  # drop the job's undecoded windows
                loop.call_soon_threadsafe(queue.put_nowait, ("delta", text))
                return None

            def on_done(fut):
                exc = fut.exception()
                item = ("error", exc) if exc is not None else ("done", fut.result())
                loop.call_soon_threadsafe(queue.put_nowait, item)

            if audio is not None:
                scheduler.submit(
                    audio, options, progress_callback=window_callback
                ).add_done_callback(on_done)
        else:

            def progress_callback(progress):
                if cancelled.is_set():
                    return False  # early-stop the seek loop
                loop.call_soon_threadsafe(queue.put_nowait, ("delta", progress.text))
                return None

            def run():
                try:
                    result = _locked_transcribe(audio_path, options, progress_callback)
                    loop.call_soon_threadsafe(queue.put_nowait, ("done", result))
                except Exception as e:
                    loop.call_soon_threadsafe(queue.put_nowait, ("error", e))
                finally:
                    audio_path.unlink(missing_ok=True)

            threading.Thread(target=run, daemon=True).start()
        try:
            while True:
                kind, value = await queue.get()
                if kind == "delta":
                    event = {"type": "transcript.text.delta", "delta": value}
                    await resp.write(f"data: {json.dumps(event)}\n\n".encode())
                elif kind == "error":
                    event = {"type": "error", "error": {"message": str(value)}}
                    await resp.write(f"data: {json.dumps(event)}\n\n".encode())
                    break
                else:
                    event = {"type": "transcript.text.done", "text": value.text}
                    await resp.write(f"data: {json.dumps(event)}\n\n".encode())
                    await resp.write(b"data: [DONE]\n\n")
                    break
            await resp.write_eof()
        except (ConnectionResetError, asyncio.CancelledError):
            cancelled.set()
        return resp

    async def transcriptions(request):
        return await _handle(request, DecodingTask.TRANSCRIBE)

    async def translations(request):
        return await _handle(request, DecodingTask.TRANSLATE)

    app = web.Application(
        client_max_size=512 * 1024 * 1024, middlewares=[rate_limit]
    )
    app.router.add_get("/health", health)
    app.router.add_post("/v1/audio/transcriptions", transcriptions)
    app.router.add_post("/v1/audio/translations", translations)
    if scheduler is not None:
        # stop the collector thread with the app — a leaked daemon thread
        # outliving the server keeps pipeline references alive and can race
        # interpreter teardown
        async def _stop_scheduler(_app):
            scheduler.shutdown()

        app.on_cleanup.append(_stop_scheduler)
    return app


def serve(pipeline, host: str = "127.0.0.1", port: int = 50060) -> None:
    from aiohttp import web

    app = create_app(pipeline)
    logging.info(f"serving OpenAI-compatible audio API on http://{host}:{port}")
    web.run_app(app, host=host, port=port, print=None)
