// avdecode: C++ host-side media decode stage over FFmpeg libraries.
//
// TPU-native replacement for the reference's PyAV-based avreader.py
// (reference: avreader.py:8-143) — same semantics, no Python in the decode
// hot path: seek-to-timestamp (global AV_TIME_BASE backward seek, matching
// container.seek(int(t*av.time_base))), first-frame-after-seek or
// frame-accurate decode, RGB24 conversion via swscale, and audio decode →
// mono float resample via swresample with chunk-edge trimming identical to
// AudioReader.read (:84-127). Exposed as a C ABI for ctypes.
//
// Build: make -C deepavfusion_tpu/native   (produces libavdecode.so)

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libavutil/opt.h>
#include <libavutil/pixdesc.h>
#include <libswresample/swresample.h>
#include <libswscale/swscale.h>
}

#include <algorithm>
#include <cmath>
#include <cstring>
#include <vector>

namespace {

struct Decoder {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* vctx = nullptr;
  AVCodecContext* actx = nullptr;
  int vstream = -1;
  int astream = -1;
  SwsContext* sws = nullptr;
  int sws_w = 0, sws_h = 0;
};

AVCodecContext* open_codec(AVFormatContext* fmt, int stream_idx, int threads) {
  AVStream* st = fmt->streams[stream_idx];
  const AVCodec* codec = avcodec_find_decoder(st->codecpar->codec_id);
  if (!codec) return nullptr;
  AVCodecContext* ctx = avcodec_alloc_context3(codec);
  if (!ctx) return nullptr;
  if (avcodec_parameters_to_context(ctx, st->codecpar) < 0) {
    avcodec_free_context(&ctx);
    return nullptr;
  }
  ctx->thread_count = threads;  // reference: stream.thread_count = 4
  if (avcodec_open2(ctx, codec, nullptr) < 0) {
    avcodec_free_context(&ctx);
    return nullptr;
  }
  return ctx;
}

double stream_ts(const AVStream* st, int64_t pts) {
  return pts * av_q2d(st->time_base);
}

}  // namespace

extern "C" {

void* avdec_open(const char* path) {
  auto* d = new Decoder();
  if (avformat_open_input(&d->fmt, path, nullptr, nullptr) < 0) {
    delete d;
    return nullptr;
  }
  if (avformat_find_stream_info(d->fmt, nullptr) < 0) {
    avformat_close_input(&d->fmt);
    delete d;
    return nullptr;
  }
  d->vstream = av_find_best_stream(d->fmt, AVMEDIA_TYPE_VIDEO, -1, -1, nullptr, 0);
  d->astream = av_find_best_stream(d->fmt, AVMEDIA_TYPE_AUDIO, -1, -1, nullptr, 0);
  if (d->vstream >= 0) d->vctx = open_codec(d->fmt, d->vstream, 4);
  if (d->astream >= 0) d->actx = open_codec(d->fmt, d->astream, 4);
  if (!d->vctx && !d->actx) {
    avformat_close_input(&d->fmt);
    delete d;
    return nullptr;
  }
  return d;
}

void avdec_close(void* handle) {
  auto* d = static_cast<Decoder*>(handle);
  if (!d) return;
  if (d->sws) sws_freeContext(d->sws);
  if (d->vctx) avcodec_free_context(&d->vctx);
  if (d->actx) avcodec_free_context(&d->actx);
  if (d->fmt) avformat_close_input(&d->fmt);
  delete d;
}

int avdec_video_info(void* handle, double* fps, double* duration,
                     double* start_time, int* width, int* height,
                     long* nframes) {
  auto* d = static_cast<Decoder*>(handle);
  if (!d || d->vstream < 0) return -1;
  AVStream* st = d->fmt->streams[d->vstream];
  *fps = av_q2d(st->avg_frame_rate);
  *duration = st->duration > 0 ? st->duration * av_q2d(st->time_base)
                               : d->fmt->duration / (double)AV_TIME_BASE;
  *start_time = st->start_time != AV_NOPTS_VALUE
                    ? st->start_time * av_q2d(st->time_base) : 0.0;
  *width = st->codecpar->width;
  *height = st->codecpar->height;
  *nframes = st->nb_frames;
  return 0;
}

int avdec_audio_info(void* handle, int* rate, double* duration,
                     double* start_time, int* channels) {
  auto* d = static_cast<Decoder*>(handle);
  if (!d || d->astream < 0) return -1;
  AVStream* st = d->fmt->streams[d->astream];
  *rate = st->codecpar->sample_rate;
  *duration = st->duration > 0 ? st->duration * av_q2d(st->time_base)
                               : d->fmt->duration / (double)AV_TIME_BASE;
  *start_time = st->start_time != AV_NOPTS_VALUE
                    ? st->start_time * av_q2d(st->time_base) : 0.0;
  *channels = st->codecpar->ch_layout.nb_channels;
  return 0;
}

// Decode one video frame. precise=0: first decodable frame at/after the seek
// point (reference quick_random_frame, avreader.py:14-22). precise=1: first
// frame with t - pts < 1/fps (reference precise_frame, :24-31).
// Returns the frame timestamp, or a negative value on failure.
double avdec_video_frame(void* handle, double t, int precise, uint8_t* out,
                         int out_w, int out_h) {
  auto* d = static_cast<Decoder*>(handle);
  if (!d || !d->vctx) return -1e9;
  AVStream* st = d->fmt->streams[d->vstream];

  av_seek_frame(d->fmt, -1, (int64_t)(t * AV_TIME_BASE), AVSEEK_FLAG_BACKWARD);
  avcodec_flush_buffers(d->vctx);

  double fps = av_q2d(st->avg_frame_rate);
  if (fps <= 0) fps = 30.0;

  AVPacket* pkt = av_packet_alloc();
  AVFrame* frame = av_frame_alloc();
  double found_ts = -1e9;

  while (av_read_frame(d->fmt, pkt) >= 0) {
    if (pkt->stream_index != d->vstream) {
      av_packet_unref(pkt);
      continue;
    }
    if (avcodec_send_packet(d->vctx, pkt) < 0) {
      av_packet_unref(pkt);
      break;
    }
    av_packet_unref(pkt);
    while (avcodec_receive_frame(d->vctx, frame) >= 0) {
      double ts = stream_ts(st, frame->best_effort_timestamp);
      if (precise && (t - ts) >= 1.0 / fps) {
        av_frame_unref(frame);
        continue;
      }
      // convert to RGB24 at (out_w, out_h)
      if (!d->sws || d->sws_w != out_w || d->sws_h != out_h) {
        if (d->sws) sws_freeContext(d->sws);
        d->sws = sws_getContext(frame->width, frame->height,
                                (AVPixelFormat)frame->format, out_w, out_h,
                                AV_PIX_FMT_RGB24, SWS_BILINEAR, nullptr,
                                nullptr, nullptr);
        d->sws_w = out_w;
        d->sws_h = out_h;
      }
      uint8_t* dst[1] = {out};
      int dst_stride[1] = {out_w * 3};
      sws_scale(d->sws, frame->data, frame->linesize, 0, frame->height, dst,
                dst_stride);
      found_ts = ts;
      av_frame_unref(frame);
      goto done;
    }
  }
done:
  av_packet_free(&pkt);
  av_frame_free(&frame);
  return found_ts;
}

// Decode one video frame and crop+scale it to (out_w, out_h) in one pass —
// the fused fast path for RandomResizedCrop-style augmentation: the crop
// rectangle is chosen in Python (cheap), the pixel work happens here, and no
// full-resolution RGB frame is ever materialized (replaces the reference's
// decode-full-frame → PIL RandomResizedCrop, image_labels_transforms.py:15).
// Downscale uses SWS_AREA (box average, close to PIL's antialiased bilinear);
// upscale uses SWS_BILINEAR. Crop offsets are rounded down to even for
// chroma-subsampled formats. Returns the frame timestamp or <0 on failure.
double avdec_video_frame_crop(void* handle, double t, int precise,
                              uint8_t* out, int crop_x, int crop_y,
                              int crop_w, int crop_h, int out_w, int out_h) {
  auto* d = static_cast<Decoder*>(handle);
  if (!d || !d->vctx) return -1e9;
  AVStream* st = d->fmt->streams[d->vstream];

  av_seek_frame(d->fmt, -1, (int64_t)(t * AV_TIME_BASE), AVSEEK_FLAG_BACKWARD);
  avcodec_flush_buffers(d->vctx);

  double fps = av_q2d(st->avg_frame_rate);
  if (fps <= 0) fps = 30.0;

  AVPacket* pkt = av_packet_alloc();
  AVFrame* frame = av_frame_alloc();
  double found_ts = -1e9;

  while (av_read_frame(d->fmt, pkt) >= 0) {
    if (pkt->stream_index != d->vstream) {
      av_packet_unref(pkt);
      continue;
    }
    if (avcodec_send_packet(d->vctx, pkt) < 0) {
      av_packet_unref(pkt);
      break;
    }
    av_packet_unref(pkt);
    while (avcodec_receive_frame(d->vctx, frame) >= 0) {
      double ts = stream_ts(st, frame->best_effort_timestamp);
      if (precise && (t - ts) >= 1.0 / fps) {
        av_frame_unref(frame);
        continue;
      }
      // clamp + even-align the crop rect
      int cx = std::max(0, std::min(crop_x, frame->width - 2)) & ~1;
      int cy = std::max(0, std::min(crop_y, frame->height - 2)) & ~1;
      int cw = std::max(2, std::min(crop_w, frame->width - cx));
      int ch = std::max(2, std::min(crop_h, frame->height - cy));

      const AVPixFmtDescriptor* desc =
          av_pix_fmt_desc_get((AVPixelFormat)frame->format);
      const uint8_t* src[4] = {nullptr, nullptr, nullptr, nullptr};
      for (int p = 0; p < 4 && frame->data[p]; ++p) {
        int xs = (p == 1 || p == 2) ? desc->log2_chroma_w : 0;
        int ys = (p == 1 || p == 2) ? desc->log2_chroma_h : 0;
        int step = (desc->flags & AV_PIX_FMT_FLAG_PLANAR)
                       ? ((desc->comp[p].depth + 7) / 8)
                       : desc->comp[0].step;
        src[p] = frame->data[p] + (cy >> ys) * frame->linesize[p] +
                 (cx >> xs) * step;
      }
      int flags = (out_w < cw || out_h < ch) ? SWS_AREA : SWS_BILINEAR;
      SwsContext* sws = sws_getContext(cw, ch, (AVPixelFormat)frame->format,
                                       out_w, out_h, AV_PIX_FMT_RGB24, flags,
                                       nullptr, nullptr, nullptr);
      if (!sws) {
        av_frame_unref(frame);
        goto crop_done;
      }
      uint8_t* dst[1] = {out};
      int dst_stride[1] = {out_w * 3};
      sws_scale(sws, src, frame->linesize, 0, ch, dst, dst_stride);
      sws_freeContext(sws);
      found_ts = ts;
      av_frame_unref(frame);
      goto crop_done;
    }
  }
crop_done:
  av_packet_free(&pkt);
  av_frame_free(&frame);
  return found_ts;
}

// Decode audio [t_min, t_max) resampled to mono float32 at `rate`.
// Chunk-edge trimming + symmetric pad/truncate to exactly
// (t_max-t_min)*rate samples (reference AudioReader.read, avreader.py:84-127).
// Returns the number of samples written (== nsamples) or negative on error.
long avdec_audio_read(void* handle, double t_min, double t_max, int rate,
                      float* out) {
  auto* d = static_cast<Decoder*>(handle);
  if (!d || !d->actx) return -1;
  AVStream* st = d->fmt->streams[d->astream];

  av_seek_frame(d->fmt, -1, (int64_t)(t_min * AV_TIME_BASE),
                AVSEEK_FLAG_BACKWARD);
  avcodec_flush_buffers(d->actx);

  SwrContext* swr = nullptr;
  AVChannelLayout mono = AV_CHANNEL_LAYOUT_MONO;
  if (swr_alloc_set_opts2(&swr, &mono, AV_SAMPLE_FMT_FLT, rate,
                          &d->actx->ch_layout, d->actx->sample_fmt,
                          d->actx->sample_rate, 0, nullptr) < 0)
    return -2;
  if (swr_init(swr) < 0) {
    swr_free(&swr);
    return -2;
  }

  // round-half-up, NOT truncation: (t0+3.0)-t0 in double can land a hair
  // under 3.0, and (long)(2.9999999999999996*16000) would drop a sample.
  // Must match the Python binding's sample-count formula exactly.
  const long nsamples = (long)std::floor((t_max - t_min) * rate + 0.5);
  std::vector<float> buf;
  buf.reserve(nsamples + rate);

  AVPacket* pkt = av_packet_alloc();
  AVFrame* frame = av_frame_alloc();
  std::vector<float> tmp;

  while (av_read_frame(d->fmt, pkt) >= 0 && (long)buf.size() < nsamples) {
    if (pkt->stream_index != d->astream) {
      av_packet_unref(pkt);
      continue;
    }
    if (avcodec_send_packet(d->actx, pkt) < 0) {
      av_packet_unref(pkt);
      break;
    }
    av_packet_unref(pkt);
    while (avcodec_receive_frame(d->actx, frame) >= 0) {
      double chunk_ts = stream_ts(st, frame->best_effort_timestamp);
      double chunk_end = chunk_ts + frame->nb_samples /
                                        (double)d->actx->sample_rate;
      if (chunk_end < t_min) {
        av_frame_unref(frame);
        continue;
      }
      if (chunk_ts > t_max) {
        av_frame_unref(frame);
        goto drain_done;
      }
      int out_cap = swr_get_out_samples(swr, frame->nb_samples);
      tmp.resize(out_cap);
      uint8_t* outp[1] = {reinterpret_cast<uint8_t*>(tmp.data())};
      int got = swr_convert(swr, outp, out_cap,
                            const_cast<const uint8_t**>(frame->extended_data),
                            frame->nb_samples);
      if (got > 0) {
        long lo = 0, hi = got;
        if (chunk_ts < t_min) lo = (long)((t_min - chunk_ts) * rate);
        if (chunk_end > t_max) hi = got - (long)((chunk_end - t_max) * rate);
        lo = std::max(0L, std::min(lo, (long)got));
        hi = std::max(lo, std::min(hi, (long)got));
        buf.insert(buf.end(), tmp.begin() + lo, tmp.begin() + hi);
      }
      av_frame_unref(frame);
    }
  }
drain_done:
  av_packet_free(&pkt);
  av_frame_free(&frame);
  swr_free(&swr);

  if (buf.empty()) return -3;

  // symmetric pad / truncate to exactly nsamples (avreader.py:121-125)
  if ((long)buf.size() < nsamples) {
    long n = buf.size();
    std::vector<float> padded(buf);
    long i = n - 1;
    int dir = -1;
    while ((long)padded.size() < nsamples) {
      padded.push_back(buf[i]);
      if (i == 0 && dir == -1) dir = 1;
      else if (i == n - 1 && dir == 1) dir = -1;
      else i += dir;
    }
    std::memcpy(out, padded.data(), nsamples * sizeof(float));
  } else {
    std::memcpy(out, buf.data(), nsamples * sizeof(float));
  }
  return nsamples;
}

}  // extern "C"
