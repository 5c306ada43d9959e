// Native audio decoder for whisperkit_tpu.
//
// TPU-native equivalent of the reference's AVFoundation decode path
// (reference: Sources/WhisperKit/Core/Audio/AudioProcessor.swift:229-305
// `loadAudio` — decode any container/codec to float PCM). Built on FFmpeg
// (libavformat/libavcodec/libswresample); exposed as a tiny C ABI consumed
// from Python via ctypes (whisperkit_tpu/audio/native.py).
//
// Output: interleaved float32 frames at the file's native sample rate and
// channel count. Mono mixdown and resampling happen downstream (NumPy host
// path or on-device kernels).

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

struct DecoderCtx {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* codec = nullptr;
  SwrContext* swr = nullptr;
  AVPacket* pkt = nullptr;
  AVFrame* frame = nullptr;

  ~DecoderCtx() {
    if (swr) swr_free(&swr);
    if (codec) avcodec_free_context(&codec);
    if (fmt) avformat_close_input(&fmt);
    if (pkt) av_packet_free(&pkt);
    if (frame) av_frame_free(&frame);
  }
};

// Convert one decoded frame to interleaved float32 and append to `out`.
int append_frame(DecoderCtx& d, AVFrame* frame, int channels,
                 std::vector<float>& out) {
  const int max_out = swr_get_out_samples(d.swr, frame->nb_samples);
  if (max_out <= 0) return 0;
  const size_t base = out.size();
  out.resize(base + static_cast<size_t>(max_out) * channels);
  uint8_t* dst = reinterpret_cast<uint8_t*>(out.data() + base);
  const int converted =
      swr_convert(d.swr, &dst, max_out,
                  const_cast<const uint8_t**>(frame->extended_data),
                  frame->nb_samples);
  if (converted < 0) {
    out.resize(base);
    return converted;
  }
  out.resize(base + static_cast<size_t>(converted) * channels);
  return 0;
}

}  // namespace

extern "C" {

// Decode `path` to interleaved float32. On success returns 0 and sets:
//   *out_samples  — malloc'd buffer of (*out_frames * *out_channels) floats
//   *out_frames   — frames per channel
//   *out_channels — channel count
//   *out_rate     — native sample rate
// Caller frees with wk_free(). Negative return = FFmpeg error code.
int wk_decode_audio(const char* path, float** out_samples, int64_t* out_frames,
                    int32_t* out_channels, int32_t* out_rate) {
  DecoderCtx d;
  int ret = avformat_open_input(&d.fmt, path, nullptr, nullptr);
  if (ret < 0) return ret;
  ret = avformat_find_stream_info(d.fmt, nullptr);
  if (ret < 0) return ret;

  const AVCodec* decoder = nullptr;
  const int stream_idx =
      av_find_best_stream(d.fmt, AVMEDIA_TYPE_AUDIO, -1, -1, &decoder, 0);
  if (stream_idx < 0 || !decoder) return stream_idx < 0 ? stream_idx : -1;
  AVStream* stream = d.fmt->streams[stream_idx];

  d.codec = avcodec_alloc_context3(decoder);
  if (!d.codec) return AVERROR(ENOMEM);
  ret = avcodec_parameters_to_context(d.codec, stream->codecpar);
  if (ret < 0) return ret;
  ret = avcodec_open2(d.codec, decoder, nullptr);
  if (ret < 0) return ret;

  const int channels = d.codec->ch_layout.nb_channels;
  const int rate = d.codec->sample_rate;
  if (channels <= 0 || rate <= 0) return -1;

  // swresample: any input format -> interleaved FLT, same layout/rate.
  ret = swr_alloc_set_opts2(&d.swr, &d.codec->ch_layout, AV_SAMPLE_FMT_FLT,
                            rate, &d.codec->ch_layout, d.codec->sample_fmt,
                            rate, 0, nullptr);
  if (ret < 0) return ret;
  ret = swr_init(d.swr);
  if (ret < 0) return ret;

  d.pkt = av_packet_alloc();
  d.frame = av_frame_alloc();
  if (!d.pkt || !d.frame) return AVERROR(ENOMEM);

  std::vector<float> samples;
  // Reserve from duration estimate to avoid repeated growth on long files.
  if (stream->duration > 0) {
    const double secs =
        stream->duration * av_q2d(stream->time_base);
    if (secs > 0 && secs < 36000) {
      samples.reserve(static_cast<size_t>(secs * rate) * channels + 4096);
    }
  }

  while (av_read_frame(d.fmt, d.pkt) >= 0) {
    if (d.pkt->stream_index == stream_idx) {
      ret = avcodec_send_packet(d.codec, d.pkt);
      if (ret >= 0) {
        while (avcodec_receive_frame(d.codec, d.frame) >= 0) {
          if (append_frame(d, d.frame, channels, samples) < 0) {
            av_packet_unref(d.pkt);
            return -1;
          }
        }
      }
    }
    av_packet_unref(d.pkt);
  }
  // Flush decoder.
  avcodec_send_packet(d.codec, nullptr);
  while (avcodec_receive_frame(d.codec, d.frame) >= 0) {
    append_frame(d, d.frame, channels, samples);
  }
  // Drain the resampler's internal buffer (trailing samples otherwise lost).
  for (;;) {
    const int max_out = swr_get_out_samples(d.swr, 0);
    if (max_out <= 0) break;
    const size_t base = samples.size();
    samples.resize(base + static_cast<size_t>(max_out) * channels);
    uint8_t* dst = reinterpret_cast<uint8_t*>(samples.data() + base);
    const int converted = swr_convert(d.swr, &dst, max_out, nullptr, 0);
    if (converted <= 0) {
      samples.resize(base);
      break;
    }
    samples.resize(base + static_cast<size_t>(converted) * channels);
  }

  const int64_t frames = static_cast<int64_t>(samples.size()) / channels;
  float* buf = static_cast<float*>(
      std::malloc(samples.size() * sizeof(float)));
  if (!buf) return AVERROR(ENOMEM);
  std::memcpy(buf, samples.data(), samples.size() * sizeof(float));

  *out_samples = buf;
  *out_frames = frames;
  *out_channels = channels;
  *out_rate = rate;
  return 0;
}

void wk_free(float* p) { std::free(p); }

}  // extern "C"
