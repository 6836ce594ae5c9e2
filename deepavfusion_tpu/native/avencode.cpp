// avencode: C++ synthetic-corpus encoder (H.264 + AAC mp4).
//
// Generates VGGSound-shaped clips (default 10 s, 25 fps, 640x360 H.264
// yuv420p with a short GOP, 16 kHz mono AAC) so the decode stage and the
// threaded loader can be benchmarked against a realistic corpus without any
// dataset mounted (VERDICT round-1 item 5; reference provisions 15 decode
// workers per GPU for exactly this load, launcher.py:114). Video content is
// moving gradients + block noise — enough spatial/temporal entropy to force
// realistic H.264 bitrate and inter-frame decode cost. No reference
// counterpart: the reference assumes a downloaded corpus.
//
// Build: make -C deepavfusion_tpu/native avencode
// Usage: avencode out.mp4 [seconds] [fps] [width] [height] [seed] [rate] [entropy]
//
// entropy=0 (default): moving gradients + 8 noise blocks — light/medium
// decode cost. entropy=1: adds per-pixel luma noise, 24 noise blocks and
// per-frame global motion (camera shake), which defeats motion compensation
// and raises residual bitrate toward real-video decode cost (NOTES.md open
// item 1: synthetic content decodes 20-40% faster than real video).

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/channel_layout.h>
#include <libavutil/imgutils.h>
#include <libavutil/opt.h>
}

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

struct Rng {  // xorshift64* — deterministic across platforms
  uint64_t s;
  explicit Rng(uint64_t seed) : s(seed * 2685821657736338717ULL + 1) {}
  uint64_t next() {
    s ^= s >> 12; s ^= s << 25; s ^= s >> 27;
    return s * 2685821657736338717ULL;
  }
  double uniform() { return (next() >> 11) * (1.0 / 9007199254740992.0); }
};

int die(const char* msg) {
  std::fprintf(stderr, "avencode: %s\n", msg);
  return 1;
}

// Fill a yuv420p frame: drifting gradient + moving noise blocks; at
// entropy>=1 also per-pixel noise + per-frame global motion (camera shake).
void fill_video(AVFrame* f, int w, int h, int t, Rng& rng, int entropy) {
  // global shake offset, redrawn every frame so motion vectors can't lock on
  int ox = 0, oy = 0;
  if (entropy >= 1) {
    ox = (int)(rng.uniform() * 17) - 8;
    oy = (int)(rng.uniform() * 17) - 8;
  }
  for (int y = 0; y < h; ++y) {
    uint8_t* row = f->data[0] + y * f->linesize[0];
    for (int x = 0; x < w; ++x) {
      uint8_t px = (uint8_t)((x + ox + 3 * t) * 255 / w + ((y + oy) * 64 / h));
      if (entropy >= 1)
        px = (uint8_t)(px + (int)(rng.next() & 31) - 16);  // ±16 luma noise
      row[x] = px;
    }
  }
  for (int y = 0; y < h / 2; ++y) {
    uint8_t* u = f->data[1] + y * f->linesize[1];
    uint8_t* v = f->data[2] + y * f->linesize[2];
    for (int x = 0; x < w / 2; ++x) {
      u[x] = (uint8_t)(128 + 64 * std::sin(0.02 * (x + ox + 2 * t)));
      v[x] = (uint8_t)(128 + 64 * std::cos(0.03 * (y + oy + t)));
    }
  }
  // moving 32x32 noise blocks: defeats intra prediction locally
  const int nblocks = entropy >= 1 ? 24 : 8;
  for (int b = 0; b < nblocks; ++b) {
    int bx = (int)(rng.uniform() * (w - 32));
    int by = (int)(rng.uniform() * (h - 32));
    for (int y = by; y < by + 32; ++y) {
      uint8_t* row = f->data[0] + y * f->linesize[0];
      for (int x = bx; x < bx + 32; ++x) row[x] = (uint8_t)rng.next();
    }
  }
}

int send_and_mux(AVFormatContext* oc, AVCodecContext* ctx, AVStream* st,
                 AVFrame* frame, AVPacket* pkt) {
  if (avcodec_send_frame(ctx, frame) < 0) return -1;
  while (true) {
    int r = avcodec_receive_packet(ctx, pkt);
    if (r == AVERROR(EAGAIN) || r == AVERROR_EOF) return 0;
    if (r < 0) return -1;
    av_packet_rescale_ts(pkt, ctx->time_base, st->time_base);
    pkt->stream_index = st->index;
    if (av_interleaved_write_frame(oc, pkt) < 0) return -1;
  }
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 2) return die("usage: avencode out.mp4 [sec] [fps] [w] [h] [seed] [rate] [entropy]");
  const char* path = argv[1];
  double seconds = argc > 2 ? std::atof(argv[2]) : 10.0;
  int fps = argc > 3 ? std::atoi(argv[3]) : 25;
  int w = argc > 4 ? std::atoi(argv[4]) : 640;
  int h = argc > 5 ? std::atoi(argv[5]) : 360;
  uint64_t seed = argc > 6 ? (uint64_t)std::atoll(argv[6]) : 0;
  int rate = argc > 7 ? std::atoi(argv[7]) : 16000;
  int entropy = argc > 8 ? std::atoi(argv[8]) : 0;

  AVFormatContext* oc = nullptr;
  if (avformat_alloc_output_context2(&oc, nullptr, nullptr, path) < 0 || !oc)
    return die("cannot allocate mp4 muxer");

  // --- video: H.264 yuv420p ---
  const AVCodec* vcodec = avcodec_find_encoder(AV_CODEC_ID_H264);
  if (!vcodec) return die("no H.264 encoder (libx264) in libavcodec");
  AVStream* vst = avformat_new_stream(oc, nullptr);
  AVCodecContext* vctx = avcodec_alloc_context3(vcodec);
  vctx->width = w;
  vctx->height = h;
  vctx->pix_fmt = AV_PIX_FMT_YUV420P;
  vctx->time_base = AVRational{1, fps};
  vctx->framerate = AVRational{fps, 1};
  vctx->gop_size = fps;  // ~1 s GOP, typical for web video
  vctx->max_b_frames = 2;
  av_opt_set(vctx->priv_data, "preset", "veryfast", 0);
  av_opt_set(vctx->priv_data, "crf", "23", 0);
  if (oc->oformat->flags & AVFMT_GLOBALHEADER)
    vctx->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
  if (avcodec_open2(vctx, vcodec, nullptr) < 0) return die("open H.264");
  avcodec_parameters_from_context(vst->codecpar, vctx);
  vst->time_base = vctx->time_base;

  // --- audio: AAC mono ---
  const AVCodec* acodec = avcodec_find_encoder(AV_CODEC_ID_AAC);
  if (!acodec) return die("no AAC encoder");
  AVStream* ast = avformat_new_stream(oc, nullptr);
  AVCodecContext* actx = avcodec_alloc_context3(acodec);
  actx->sample_fmt = AV_SAMPLE_FMT_FLTP;
  actx->sample_rate = rate;
  av_channel_layout_default(&actx->ch_layout, 1);
  actx->time_base = AVRational{1, rate};
  actx->bit_rate = 64000;
  if (oc->oformat->flags & AVFMT_GLOBALHEADER)
    actx->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
  if (avcodec_open2(actx, acodec, nullptr) < 0) return die("open AAC");
  avcodec_parameters_from_context(ast->codecpar, actx);
  ast->time_base = actx->time_base;

  if (!(oc->oformat->flags & AVFMT_NOFILE) &&
      avio_open(&oc->pb, path, AVIO_FLAG_WRITE) < 0)
    return die("cannot open output file");
  if (avformat_write_header(oc, nullptr) < 0) return die("write header");

  AVPacket* pkt = av_packet_alloc();
  Rng rng(seed + 1);

  // interleave: encode audio frames to keep pace with video pts
  AVFrame* vf = av_frame_alloc();
  vf->format = AV_PIX_FMT_YUV420P;
  vf->width = w;
  vf->height = h;
  av_frame_get_buffer(vf, 0);

  AVFrame* af = av_frame_alloc();
  af->format = AV_SAMPLE_FMT_FLTP;
  af->sample_rate = rate;
  av_channel_layout_default(&af->ch_layout, 1);
  af->nb_samples = actx->frame_size > 0 ? actx->frame_size : 1024;
  av_frame_get_buffer(af, 0);

  const int n_video = (int)(seconds * fps);
  const int64_t n_audio = (int64_t)(seconds * rate);
  int64_t apts = 0;
  // Tone mixture + noise, amplitude-modulated. The PRIMARY tone's frequency
  // band is a class attribute: seed%4 selects an eighth-octave band
  // (220*2^(k/8) .. 220*2^((k+1)/8) Hz — adjacent, narrowly separated), with
  // the exact frequency uniform within the band; a louder random distractor
  // tone spans 880-1760 Hz. Clips in the same seed-class share only the
  // primary band, so kNN retrieval over features (labels = seed%4) is
  // non-trivial for an untrained model but clearly learnable, while staying
  // fully deterministic per seed.
  const double am_rate = 0.5;
  const int cls = (int)(seed % 4);
  double f1 = 220.0 * std::pow(2.0, (cls + rng.uniform()) / 8.0);
  double f2 = 880.0 + 880.0 * rng.uniform();

  for (int t = 0; t < n_video; ++t) {
    if (av_frame_make_writable(vf) < 0) return die("frame writable");
    fill_video(vf, w, h, t, rng, entropy);
    vf->pts = t;
    if (send_and_mux(oc, vctx, vst, vf, pkt) < 0) return die("encode video");

    // audio up to the next video pts
    int64_t target = (int64_t)((t + 1) * (double)rate / fps);
    while (apts < std::min(target, n_audio)) {
      if (av_frame_make_writable(af) < 0) return die("aframe writable");
      float* dst = (float*)af->data[0];
      for (int i = 0; i < af->nb_samples; ++i) {
        double tt = (apts + i) / (double)rate;
        double am = 0.5 + 0.5 * std::sin(2 * M_PI * am_rate * tt);
        dst[i] = (float)(am * (0.15 * std::sin(2 * M_PI * f1 * tt) +
                               0.3 * std::sin(2 * M_PI * f2 * tt)) +
                         0.05 * (rng.uniform() - 0.5));
      }
      af->pts = apts;
      apts += af->nb_samples;
      if (send_and_mux(oc, actx, ast, af, pkt) < 0) return die("encode audio");
    }
  }
  // flush encoders
  if (send_and_mux(oc, vctx, vst, nullptr, pkt) < 0) return die("flush video");
  if (send_and_mux(oc, actx, ast, nullptr, pkt) < 0) return die("flush audio");

  av_write_trailer(oc);
  if (!(oc->oformat->flags & AVFMT_NOFILE)) avio_closep(&oc->pb);
  av_packet_free(&pkt);
  av_frame_free(&vf);
  av_frame_free(&af);
  avcodec_free_context(&vctx);
  avcodec_free_context(&actx);
  avformat_free_context(oc);
  return 0;
}
