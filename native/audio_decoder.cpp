// Native audio decoder for whisperkit_tpu.
//
// TPU-native equivalent of the reference's AVFoundation decode path
// (reference: Sources/WhisperKit/Core/Audio/AudioProcessor.swift:229-305
// `loadAudio` — decode any container/codec to float PCM; :307-350
// `loadAudioAsFloatArray` — chunked conversion of long files to bound
// memory). Built on FFmpeg (libavformat/libavcodec/libswresample); exposed
// as a tiny C ABI consumed from Python via ctypes
// (whisperkit_tpu/audio/native.py).
//
// Two entry styles over ONE decode path:
//   wk_open_audio / wk_read_audio / wk_close_audio — incremental frame
//     reads (bounded memory for hour-scale files);
//   wk_decode_audio — whole-file convenience, implemented as a read loop
//     over the same stream context, so both produce identical samples.
//
// Output: interleaved float32 frames at the file's native sample rate and
// channel count. Mono mixdown and resampling happen downstream (NumPy host
// path or on-device kernels).

#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/opt.h>
#include <libswresample/swresample.h>
}

namespace {

struct StreamCtx {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* codec = nullptr;
  SwrContext* swr = nullptr;
  AVPacket* pkt = nullptr;
  AVFrame* frame = nullptr;
  int stream_idx = -1;
  int channels = 0;
  int rate = 0;
  // decoded-but-not-yet-consumed interleaved floats
  std::vector<float> pending;
  size_t pending_off = 0;  // floats already consumed from `pending`
  bool input_eof = false;  // av_read_frame exhausted + decoder flushed
  bool drained = false;    // swr drained after input_eof

  ~StreamCtx() {
    if (swr) swr_free(&swr);
    if (codec) avcodec_free_context(&codec);
    if (fmt) avformat_close_input(&fmt);
    if (pkt) av_packet_free(&pkt);
    if (frame) av_frame_free(&frame);
  }
};

// Convert one decoded frame to interleaved float32 and append to `out`.
int append_frame(StreamCtx& d, AVFrame* frame, std::vector<float>& out) {
  const int max_out = swr_get_out_samples(d.swr, frame->nb_samples);
  if (max_out <= 0) return 0;
  const size_t base = out.size();
  out.resize(base + static_cast<size_t>(max_out) * d.channels);
  uint8_t* dst = reinterpret_cast<uint8_t*>(out.data() + base);
  const int converted =
      swr_convert(d.swr, &dst, max_out,
                  const_cast<const uint8_t**>(frame->extended_data),
                  frame->nb_samples);
  if (converted < 0) {
    out.resize(base);
    return converted;
  }
  out.resize(base + static_cast<size_t>(converted) * d.channels);
  return 0;
}

// Drain the resampler's internal buffer (trailing samples otherwise lost).
void drain_swr(StreamCtx& d, std::vector<float>& out) {
  for (;;) {
    const int max_out = swr_get_out_samples(d.swr, 0);
    if (max_out <= 0) break;
    const size_t base = out.size();
    out.resize(base + static_cast<size_t>(max_out) * d.channels);
    uint8_t* dst = reinterpret_cast<uint8_t*>(out.data() + base);
    const int converted = swr_convert(d.swr, &dst, max_out, nullptr, 0);
    if (converted <= 0) {
      out.resize(base);
      break;
    }
    out.resize(base + static_cast<size_t>(converted) * d.channels);
  }
}

// Decode packets until at least `want_floats` are pending (or EOF).
// Returns 0 on success, negative FFmpeg error otherwise.
int fill_pending(StreamCtx& d, size_t want_floats) {
  while (!d.drained && d.pending.size() - d.pending_off < want_floats) {
    if (!d.input_eof) {
      const int rd = av_read_frame(d.fmt, d.pkt);
      if (rd >= 0) {
        if (d.pkt->stream_index == d.stream_idx) {
          const int ret = avcodec_send_packet(d.codec, d.pkt);
          if (ret >= 0) {
            while (avcodec_receive_frame(d.codec, d.frame) >= 0) {
              if (append_frame(d, d.frame, d.pending) < 0) {
                av_packet_unref(d.pkt);
                return -1;
              }
            }
          }
        }
        av_packet_unref(d.pkt);
        continue;
      }
      // input exhausted: flush the decoder once
      avcodec_send_packet(d.codec, nullptr);
      while (avcodec_receive_frame(d.codec, d.frame) >= 0) {
        if (append_frame(d, d.frame, d.pending) < 0) return -1;
      }
      d.input_eof = true;
    } else {
      drain_swr(d, d.pending);
      d.drained = true;
    }
  }
  return 0;
}

StreamCtx* open_stream(const char* path, int* err) {
  StreamCtx* d = new StreamCtx();
  int ret = avformat_open_input(&d->fmt, path, nullptr, nullptr);
  if (ret < 0) { *err = ret; delete d; return nullptr; }
  ret = avformat_find_stream_info(d->fmt, nullptr);
  if (ret < 0) { *err = ret; delete d; return nullptr; }

  const AVCodec* decoder = nullptr;
  d->stream_idx =
      av_find_best_stream(d->fmt, AVMEDIA_TYPE_AUDIO, -1, -1, &decoder, 0);
  if (d->stream_idx < 0 || !decoder) {
    *err = d->stream_idx < 0 ? d->stream_idx : -1;
    delete d;
    return nullptr;
  }
  AVStream* stream = d->fmt->streams[d->stream_idx];

  d->codec = avcodec_alloc_context3(decoder);
  if (!d->codec) { *err = AVERROR(ENOMEM); delete d; return nullptr; }
  ret = avcodec_parameters_to_context(d->codec, stream->codecpar);
  if (ret >= 0) ret = avcodec_open2(d->codec, decoder, nullptr);
  if (ret < 0) { *err = ret; delete d; return nullptr; }

  d->channels = d->codec->ch_layout.nb_channels;
  d->rate = d->codec->sample_rate;
  if (d->channels <= 0 || d->rate <= 0) { *err = -1; delete d; return nullptr; }

  // swresample: any input format -> interleaved FLT, same layout/rate.
  ret = swr_alloc_set_opts2(&d->swr, &d->codec->ch_layout, AV_SAMPLE_FMT_FLT,
                            d->rate, &d->codec->ch_layout,
                            d->codec->sample_fmt, d->rate, 0, nullptr);
  if (ret >= 0) ret = swr_init(d->swr);
  if (ret < 0) { *err = ret; delete d; return nullptr; }

  d->pkt = av_packet_alloc();
  d->frame = av_frame_alloc();
  if (!d->pkt || !d->frame) { *err = AVERROR(ENOMEM); delete d; return nullptr; }
  *err = 0;
  return d;
}

}  // namespace

extern "C" {

// Open `path` for incremental decoding. Returns an opaque handle (NULL on
// failure, with *out_err set to the negative FFmpeg error code) and fills
// *out_channels / *out_rate with the stream's native layout.
void* wk_open_audio(const char* path, int32_t* out_channels, int32_t* out_rate,
                    int32_t* out_err) {
  int err = 0;
  StreamCtx* d = open_stream(path, &err);
  if (out_err) *out_err = err;
  if (!d) return nullptr;
  if (out_channels) *out_channels = d->channels;
  if (out_rate) *out_rate = d->rate;
  return d;
}

// Read up to `max_frames` interleaved frames into caller-owned `buf`
// (capacity max_frames * channels floats). Returns frames read, 0 at EOF,
// negative FFmpeg error on failure. Successive reads traverse the file
// start-to-end; concatenated output is identical to wk_decode_audio's.
int64_t wk_read_audio(void* handle, float* buf, int64_t max_frames) {
  if (!handle || !buf || max_frames < 0) return -1;
  StreamCtx& d = *static_cast<StreamCtx*>(handle);
  const size_t want = static_cast<size_t>(max_frames) * d.channels;
  if (fill_pending(d, want) < 0) return -1;
  const size_t avail = d.pending.size() - d.pending_off;
  const size_t n = avail < want ? avail : want;
  std::memcpy(buf, d.pending.data() + d.pending_off, n * sizeof(float));
  d.pending_off += n;
  // compact once consumed past half the buffer so pending stays ~chunk-sized
  if (d.pending_off > d.pending.size() / 2) {
    d.pending.erase(d.pending.begin(),
                    d.pending.begin() + static_cast<long>(d.pending_off));
    d.pending_off = 0;
  }
  return static_cast<int64_t>(n / d.channels);
}

void wk_close_audio(void* handle) {
  delete static_cast<StreamCtx*>(handle);
}

// Decode `path` to interleaved float32 in one call. On success returns 0:
//   *out_samples  — malloc'd buffer of (*out_frames * *out_channels) floats
//   *out_frames   — frames per channel
//   *out_channels — channel count
//   *out_rate     — native sample rate
// Caller frees with wk_free(). Negative return = FFmpeg error code.
// Implemented as a read loop over the streaming context, so the sample
// sequence is identical to incremental wk_read_audio consumption.
int wk_decode_audio(const char* path, float** out_samples, int64_t* out_frames,
                    int32_t* out_channels, int32_t* out_rate) {
  int err = 0;
  StreamCtx* d = open_stream(path, &err);
  if (!d) return err ? err : -1;

  std::vector<float> samples;
  AVStream* stream = d->fmt->streams[d->stream_idx];
  // Reserve from duration estimate to avoid repeated growth on long files.
  if (stream->duration > 0) {
    const double secs = stream->duration * av_q2d(stream->time_base);
    if (secs > 0 && secs < 36000) {
      samples.reserve(static_cast<size_t>(secs * d->rate) * d->channels +
                      4096);
    }
  }

  const int64_t step = 1 << 18;  // 256k frames per read
  std::vector<float> buf(static_cast<size_t>(step) * d->channels);
  for (;;) {
    const int64_t got = wk_read_audio(d, buf.data(), step);
    if (got < 0) { delete d; return -1; }
    if (got == 0) break;
    samples.insert(samples.end(), buf.begin(),
                   buf.begin() + static_cast<size_t>(got) * d->channels);
  }

  const int channels = d->channels;
  const int rate = d->rate;
  delete d;

  const int64_t frames = static_cast<int64_t>(samples.size()) / channels;
  float* out = static_cast<float*>(
      std::malloc(samples.size() * sizeof(float)));
  if (!out) return AVERROR(ENOMEM);
  std::memcpy(out, samples.data(), samples.size() * sizeof(float));

  *out_samples = out;
  *out_frames = frames;
  *out_channels = channels;
  *out_rate = rate;
  return 0;
}

void wk_free(float* p) { std::free(p); }

// Single-pass grid check + int16 convert for the int16 audio wire format
// (pipelines/whisper._upload_audio). Returns 1 iff every sample lies
// exactly on the i/32768 grid within int16 range (so int16-over-the-wire
// reconstructs the f32 array bit-identically on device), else 0. `dst`
// is always filled with the round/clip conversion so the forced mode
// (int16_audio_transfer=True) reuses the same pass. Replaces ~7 NumPy
// passes over the array (scale, rint x2, three compares, clip, astype)
// that cost ~4 s host-blocking per 60-min transcribe call.
int wk_f32_grid_to_i16(const float* src, int64_t n, int16_t* dst) {
  int64_t bad = 0;
  for (int64_t i = 0; i < n; ++i) {
    const float v = src[i] * 32768.0f;
    float r = rintf(v);  // ties-to-even, matches np.rint
    // branch-free accumulate + clamp keeps the loop auto-vectorizable
    bad += (r != v) | (r < -32768.0f) | (r > 32767.0f);
    r = r < -32768.0f ? -32768.0f : r;
    r = r > 32767.0f ? 32767.0f : r;
    dst[i] = static_cast<int16_t>(r);
  }
  return bad == 0 ? 1 : 0;
}

}  // extern "C"
