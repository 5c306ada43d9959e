"""OpenAI Audio API schema models.

Reference: the reference generates Swift types from
scripts/specs/localserver_openapi.yaml via swift-openapi-generator
(Makefile:204-219, Server/GeneratedSources ~1,864 LoC). Here the same
schema surface is pydantic models — used to validate server responses in
tests and importable by clients.
"""

from __future__ import annotations

from typing import Literal, Optional

from pydantic import BaseModel, Field


class TranscriptionRequestFields(BaseModel):
    """Multipart form fields of POST /v1/audio/transcriptions."""

    model: Optional[str] = None
    language: Optional[str] = None
    prompt: Optional[str] = None
    temperature: float = 0.0
    response_format: Literal["json", "text", "srt", "vtt", "verbose_json"] = "json"
    stream: bool = False
    timestamp_granularities: list[Literal["word", "segment"]] = Field(
        default_factory=list
    )


class TranscriptionSegmentModel(BaseModel):
    id: int
    seek: int
    start: float
    end: float
    text: str
    tokens: list[int]
    temperature: float
    avg_logprob: float
    compression_ratio: float
    no_speech_prob: float


class TranscriptionWordModel(BaseModel):
    word: str
    start: float
    end: float


class TranscriptionResponse(BaseModel):
    """response_format=json."""

    text: str


class VerboseTranscriptionResponse(BaseModel):
    """response_format=verbose_json."""

    task: str
    language: str
    duration: float
    text: str
    segments: list[TranscriptionSegmentModel]
    words: Optional[list[TranscriptionWordModel]] = None


class StreamDeltaEvent(BaseModel):
    type: Literal["transcript.text.delta"]
    delta: str


class StreamDoneEvent(BaseModel):
    type: Literal["transcript.text.done"]
    text: str


class ErrorBody(BaseModel):
    message: str


class ErrorResponse(BaseModel):
    error: ErrorBody


class HealthResponse(BaseModel):
    status: str
    model_state: str
    batches_run: Optional[int] = None
    jobs_run: Optional[int] = None
