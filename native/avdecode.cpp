// avdecode: minimal, robust libav-based media ingest for the AV-JEPA TPU
// framework's host data pipeline.
//
// TPU-native replacement for the reference's decord VideoReader + ffmpeg
// subprocess pipe (reference: src/datasets/audiovideo_dataset.py:215-240,
// 296-316): one C library, no subprocesses, GIL-free when called via ctypes
// from the Python thread-pool loader.
//
// API (C, stable):
//   avdec_probe(path, &fps, &num_frames, &w, &h, &sample_rate) -> 0/err
//   avdec_decode_frames(path, indices, n, out_rgb, out_h, out_w)  -> 0/err
//       decodes the given (sorted ascending) frame indices to RGB24 resized
//       to out_h x out_w  (sequential decode; frame-accurate)
//   avdec_decode_audio(path, out, max_samples, &sample_rate) -> samples
//       decodes the full audio track to mono f32 (pass out=NULL to query the
//       required size)

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libswresample/swresample.h>
#include <libswscale/swscale.h>
#include <libavutil/imgutils.h>
#include <libavutil/opt.h>
}

#include <cstring>
#include <cmath>
#include <vector>

namespace {

struct VideoCtx {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* dec = nullptr;
  int stream_index = -1;

  ~VideoCtx() {
    if (dec) avcodec_free_context(&dec);
    if (fmt) avformat_close_input(&fmt);
  }

  int open(const char* path, AVMediaType type) {
    if (avformat_open_input(&fmt, path, nullptr, nullptr) < 0) return -1;
    if (avformat_find_stream_info(fmt, nullptr) < 0) return -2;
    stream_index = av_find_best_stream(fmt, type, -1, -1, nullptr, 0);
    if (stream_index < 0) return -3;
    const AVCodecParameters* par = fmt->streams[stream_index]->codecpar;
    const AVCodec* codec = avcodec_find_decoder(par->codec_id);
    if (!codec) return -4;
    dec = avcodec_alloc_context3(codec);
    if (!dec) return -5;
    if (avcodec_parameters_to_context(dec, par) < 0) return -6;
    dec->thread_count = 0;  // auto
    if (avcodec_open2(dec, codec, nullptr) < 0) return -7;
    return 0;
  }
};

}  // namespace

extern "C" {

int avdec_probe(const char* path, double* fps, long* num_frames, int* width,
                int* height, int* sample_rate) {
  VideoCtx v;
  int rc = v.open(path, AVMEDIA_TYPE_VIDEO);
  if (rc != 0) return rc;
  AVStream* st = v.fmt->streams[v.stream_index];
  AVRational r = st->avg_frame_rate;
  if (r.num <= 0 || r.den <= 0) r = st->r_frame_rate;
  *fps = (r.den > 0) ? av_q2d(r) : 0.0;
  *width = v.dec->width;
  *height = v.dec->height;
  long nf = st->nb_frames;
  if (nf <= 0 && st->duration > 0 && *fps > 0)
    nf = (long)(st->duration * av_q2d(st->time_base) * (*fps));
  if (nf <= 0 && v.fmt->duration > 0 && *fps > 0)
    nf = (long)((double)v.fmt->duration / AV_TIME_BASE * (*fps));
  *num_frames = nf;

  *sample_rate = 0;
  int astream = av_find_best_stream(v.fmt, AVMEDIA_TYPE_AUDIO, -1, -1, nullptr, 0);
  if (astream >= 0)
    *sample_rate = v.fmt->streams[astream]->codecpar->sample_rate;
  return 0;
}

int avdec_decode_frames(const char* path, const long* indices, int n,
                        unsigned char* out, int out_h, int out_w) {
  if (n <= 0) return 0;
  // indices must be ascending and non-negative: the catch-up copy below
  // reads slot want-1, so a negative/unsorted first index would read out of
  // bounds in NATIVE memory rather than raising a Python error
  if (indices[0] < 0) return -22;
  for (int i = 1; i < n; ++i)
    if (indices[i] < indices[i - 1]) return -22;
  VideoCtx v;
  int rc = v.open(path, AVMEDIA_TYPE_VIDEO);
  if (rc != 0) return rc;

  SwsContext* sws = nullptr;
  int sws_w = 0, sws_h = 0, sws_fmt = -1;
  AVPacket* pkt = av_packet_alloc();
  AVFrame* frame = av_frame_alloc();
  const size_t frame_bytes = (size_t)out_h * out_w * 3;

  long frame_counter = 0;
  int want = 0;  // next index slot to fill
  long max_index = indices[n - 1];
  int err = 0;
  bool flushing = false;

  while (want < n) {
    if (!flushing) {
      int r = av_read_frame(v.fmt, pkt);
      if (r < 0) {
        flushing = true;
        avcodec_send_packet(v.dec, nullptr);
      } else {
        if (pkt->stream_index != v.stream_index) {
          av_packet_unref(pkt);
          continue;
        }
        avcodec_send_packet(v.dec, pkt);
        av_packet_unref(pkt);
      }
    }
    while (want < n) {
      int r = avcodec_receive_frame(v.dec, frame);
      if (r == AVERROR(EAGAIN)) break;
      if (r == AVERROR_EOF) {
        // pad remaining requests with the last decoded frame (edge-pad
        // semantics like the reference's clip sampling)
        while (want < n) {
          if (want > 0)
            memcpy(out + (size_t)want * frame_bytes,
                   out + (size_t)(want - 1) * frame_bytes, frame_bytes);
          else
            memset(out + (size_t)want * frame_bytes, 0, frame_bytes);
          ++want;
        }
        break;
      }
      if (r < 0) { err = -20; goto done; }

      bool wanted = false;
      while (want < n && indices[want] == frame_counter) {
        wanted = true;
        // rebuild the scaler if the stream legally changes geometry/format
        // mid-stream (same pattern as avdec_crop_resize_rgb)
        if (sws && (frame->width != sws_w || frame->height != sws_h ||
                    frame->format != sws_fmt)) {
          sws_freeContext(sws);
          sws = nullptr;
        }
        if (!sws) {
          sws = sws_getContext(frame->width, frame->height,
                               (AVPixelFormat)frame->format, out_w, out_h,
                               AV_PIX_FMT_RGB24, SWS_BILINEAR, nullptr,
                               nullptr, nullptr);
          if (!sws) { err = -21; goto done; }
          sws_w = frame->width;
          sws_h = frame->height;
          sws_fmt = frame->format;
        }
        uint8_t* dst[1] = {out + (size_t)want * frame_bytes};
        int dst_stride[1] = {out_w * 3};
        sws_scale(sws, frame->data, frame->linesize, 0, frame->height, dst,
                  dst_stride);
        ++want;
      }
      // duplicate-index requests (same frame wanted multiple times)
      while (want < n && indices[want] < frame_counter) {
        memcpy(out + (size_t)want * frame_bytes,
               out + (size_t)(want - 1) * frame_bytes, frame_bytes);
        ++want;
      }
      ++frame_counter;
      av_frame_unref(frame);
      if (frame_counter > max_index && want >= n) break;
    }
    if (flushing && want < n) {
      // EOF handled inside receive loop; if we get here without progress, pad
      while (want < n) {
        if (want > 0)
          memcpy(out + (size_t)want * frame_bytes,
                 out + (size_t)(want - 1) * frame_bytes, frame_bytes);
        else
          memset(out + (size_t)want * frame_bytes, 0, frame_bytes);
        ++want;
      }
    }
  }

done:
  if (sws) sws_freeContext(sws);
  av_frame_free(&frame);
  av_packet_free(&pkt);
  return err;
}

long avdec_decode_audio(const char* path, float* out, long max_samples,
                        int* sample_rate) {
  VideoCtx a;
  int rc = a.open(path, AVMEDIA_TYPE_AUDIO);
  if (rc != 0) return rc;
  *sample_rate = a.dec->sample_rate;

  SwrContext* swr = nullptr;
  AVChannelLayout mono = AV_CHANNEL_LAYOUT_MONO;
  if (swr_alloc_set_opts2(&swr, &mono, AV_SAMPLE_FMT_FLT, a.dec->sample_rate,
                          &a.dec->ch_layout, a.dec->sample_fmt,
                          a.dec->sample_rate, 0, nullptr) < 0)
    return -30;
  if (swr_init(swr) < 0) { swr_free(&swr); return -31; }

  AVPacket* pkt = av_packet_alloc();
  AVFrame* frame = av_frame_alloc();
  long written = 0;
  bool flushing = false;
  bool full = false;
  std::vector<float> tmp;

  auto consume = [&](AVFrame* f) {
    int out_count = f->nb_samples;
    tmp.resize(out_count);
    uint8_t* outbuf[1] = {(uint8_t*)tmp.data()};
    int conv = swr_convert(swr, outbuf, out_count,
                           (const uint8_t**)f->extended_data, f->nb_samples);
    if (conv > 0) {
      if (out) {
        long take = conv;
        if (written + take > max_samples) take = max_samples - written;
        if (take > 0)
          memcpy(out + written, tmp.data(), take * sizeof(float));
      }
      written += conv;
    }
    av_frame_unref(f);
    if (out && written >= max_samples && max_samples > 0) full = true;
  };

  while (!full) {
    if (!flushing) {
      int r = av_read_frame(a.fmt, pkt);
      if (r < 0) {
        flushing = true;
        avcodec_send_packet(a.dec, nullptr);
      } else {
        if (pkt->stream_index != a.stream_index) {
          av_packet_unref(pkt);
          continue;
        }
        // a full decoder rejects the packet with EAGAIN (multi-frame-per-
        // packet codecs); drain pending frames and RETRY rather than drop
        while (avcodec_send_packet(a.dec, pkt) == AVERROR(EAGAIN) && !full) {
          int rr = avcodec_receive_frame(a.dec, frame);
          if (rr < 0) break;  // shouldn't happen; avoid spinning
          consume(frame);
        }
        av_packet_unref(pkt);
      }
    }
    // drain everything available; EAGAIN -> read more input, EOF/error -> done
    while (!full) {
      int r = avcodec_receive_frame(a.dec, frame);
      if (r == AVERROR(EAGAIN)) break;
      if (r < 0) { full = true; break; }
      consume(frame);
    }
    if (flushing && !full) break;  // EAGAIN after flush: nothing more comes
  }

  swr_free(&swr);
  av_frame_free(&frame);
  av_packet_free(&pkt);
  return written;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Test-clip encoder (for the test suite: the image ships no sample media and
// no ffmpeg CLI). Writes mpeg4 video (+ pcm_s16le audio) into an .avi.
// ---------------------------------------------------------------------------

extern "C" int avdec_write_test_video(const char* path, int n_frames, int w,
                                      int h, double fps, int with_audio) {
  AVFormatContext* fmt = nullptr;
  if (avformat_alloc_output_context2(&fmt, nullptr, "avi", path) < 0 || !fmt)
    return -1;
  int err = 0;
  AVCodecContext* venc = nullptr;
  AVCodecContext* aenc = nullptr;
  AVFrame* vframe = nullptr;
  AVFrame* aframe = nullptr;
  AVPacket* pkt = av_packet_alloc();
  AVStream* vst = nullptr;
  AVStream* ast = nullptr;
  const int sr = 44100;

  {
    if (!pkt) { err = -11; goto done; }
    const AVCodec* vc = avcodec_find_encoder(AV_CODEC_ID_MPEG4);
    if (!vc) { err = -2; goto done; }
    vst = avformat_new_stream(fmt, vc);
    venc = avcodec_alloc_context3(vc);
    if (!vst || !venc) { err = -12; goto done; }
    venc->width = w;
    venc->height = h;
    venc->pix_fmt = AV_PIX_FMT_YUV420P;
    venc->time_base = av_d2q(1.0 / fps, 100000);
    venc->bit_rate = 2000000;
    venc->gop_size = 12;
    if (fmt->oformat->flags & AVFMT_GLOBALHEADER)
      venc->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
    if (avcodec_open2(venc, vc, nullptr) < 0) { err = -3; goto done; }
    avcodec_parameters_from_context(vst->codecpar, venc);
    vst->time_base = venc->time_base;

    if (with_audio) {
      const AVCodec* ac = avcodec_find_encoder(AV_CODEC_ID_PCM_S16LE);
      if (!ac) { err = -4; goto done; }
      ast = avformat_new_stream(fmt, ac);
      aenc = avcodec_alloc_context3(ac);
      if (!ast || !aenc) { err = -13; goto done; }
      aenc->sample_rate = sr;
      av_channel_layout_default(&aenc->ch_layout, 1);
      aenc->sample_fmt = AV_SAMPLE_FMT_S16;
      aenc->time_base = {1, sr};
      if (avcodec_open2(aenc, ac, nullptr) < 0) { err = -5; goto done; }
      avcodec_parameters_from_context(ast->codecpar, aenc);
      ast->time_base = aenc->time_base;
    }

    if (!(fmt->oformat->flags & AVFMT_NOFILE)) {
      if (avio_open(&fmt->pb, path, AVIO_FLAG_WRITE) < 0) { err = -6; goto done; }
    }
    if (avformat_write_header(fmt, nullptr) < 0) { err = -7; goto done; }

    vframe = av_frame_alloc();
    if (!vframe) { err = -14; goto done; }
    vframe->format = AV_PIX_FMT_YUV420P;
    vframe->width = w;
    vframe->height = h;
    av_frame_get_buffer(vframe, 0);

    for (int i = 0; i < n_frames; ++i) {
      av_frame_make_writable(vframe);
      for (int y = 0; y < h; ++y)
        for (int x = 0; x < w; ++x)
          vframe->data[0][y * vframe->linesize[0] + x] =
              (unsigned char)((x + y + i * 3) & 0xff);
      for (int y = 0; y < h / 2; ++y)
        for (int x = 0; x < w / 2; ++x) {
          vframe->data[1][y * vframe->linesize[1] + x] =
              (unsigned char)(128 + ((i * 2) & 0x3f));
          vframe->data[2][y * vframe->linesize[2] + x] =
              (unsigned char)(64 + (x & 0x3f));
        }
      vframe->pts = i;
      if (avcodec_send_frame(venc, vframe) < 0) { err = -8; goto done; }
      while (avcodec_receive_packet(venc, pkt) == 0) {
        av_packet_rescale_ts(pkt, venc->time_base, vst->time_base);
        pkt->stream_index = vst->index;
        av_interleaved_write_frame(fmt, pkt);
      }
    }
    avcodec_send_frame(venc, nullptr);
    while (avcodec_receive_packet(venc, pkt) == 0) {
      av_packet_rescale_ts(pkt, venc->time_base, vst->time_base);
      pkt->stream_index = vst->index;
      av_interleaved_write_frame(fmt, pkt);
    }

    if (with_audio) {
      long total = (long)(n_frames / fps * sr);
      const int chunk = 4096;
      aframe = av_frame_alloc();
      if (!aframe) { err = -15; goto done; }
      aframe->format = AV_SAMPLE_FMT_S16;
      av_channel_layout_default(&aframe->ch_layout, 1);
      aframe->sample_rate = sr;
      long written = 0;
      while (written < total) {
        int ns = (int)((total - written) < chunk ? (total - written) : chunk);
        aframe->nb_samples = ns;
        av_frame_get_buffer(aframe, 0);
        av_frame_make_writable(aframe);
        int16_t* smp = (int16_t*)aframe->data[0];
        for (int i = 0; i < ns; ++i) {
          double t = (double)(written + i) / sr;
          smp[i] = (int16_t)(12000.0 * sin(2.0 * 3.14159265358979 * 440.0 * t));
        }
        aframe->pts = written;
        if (avcodec_send_frame(aenc, aframe) < 0) { err = -9; goto done; }
        while (avcodec_receive_packet(aenc, pkt) == 0) {
          av_packet_rescale_ts(pkt, aenc->time_base, ast->time_base);
          pkt->stream_index = ast->index;
          av_interleaved_write_frame(fmt, pkt);
        }
        written += ns;
        av_frame_unref(aframe);
        aframe->format = AV_SAMPLE_FMT_S16;
        av_channel_layout_default(&aframe->ch_layout, 1);
        aframe->sample_rate = sr;
      }
      avcodec_send_frame(aenc, nullptr);
      while (avcodec_receive_packet(aenc, pkt) == 0) {
        av_packet_rescale_ts(pkt, aenc->time_base, ast->time_base);
        pkt->stream_index = ast->index;
        av_interleaved_write_frame(fmt, pkt);
      }
    }
    av_write_trailer(fmt);
  }

done:
  if (venc) avcodec_free_context(&venc);
  if (aenc) avcodec_free_context(&aenc);
  if (vframe) av_frame_free(&vframe);
  if (aframe) av_frame_free(&aframe);
  if (pkt) av_packet_free(&pkt);
  if (fmt) {
    if (!(fmt->oformat->flags & AVFMT_NOFILE) && fmt->pb) avio_closep(&fmt->pb);
    avformat_free_context(fmt);
  }
  return err;
}

// ---------------------------------------------------------------------------
// Encode caller-provided RGB24 frames + mono f32 PCM into an AVI
// (MPEG4 + PCM_S16LE). The content-controllable sibling of
// avdec_write_test_video: test/chain tooling uses it to author media with
// known class statistics (motion direction, tone frequency). pcm may be
// null (video-only clip).
// ---------------------------------------------------------------------------

extern "C" int avdec_encode_av(const char* path, const unsigned char* rgb,
                               int n_frames, int w, int h, double fps,
                               const float* pcm, long n_samples, int sr) {
  AVFormatContext* fmt = nullptr;
  if (avformat_alloc_output_context2(&fmt, nullptr, "avi", path) < 0 || !fmt)
    return -1;
  int err = 0;
  AVCodecContext* venc = nullptr;
  AVCodecContext* aenc = nullptr;
  AVFrame* vframe = nullptr;
  AVFrame* aframe = nullptr;
  AVPacket* pkt = av_packet_alloc();
  AVStream* vst = nullptr;
  AVStream* ast = nullptr;
  SwsContext* sws = nullptr;
  const int with_audio = (pcm != nullptr && n_samples > 0);

  {
    if (!pkt) { err = -11; goto done; }
    const AVCodec* vc = avcodec_find_encoder(AV_CODEC_ID_MPEG4);
    if (!vc) { err = -2; goto done; }
    vst = avformat_new_stream(fmt, vc);
    venc = avcodec_alloc_context3(vc);
    if (!vst || !venc) { err = -12; goto done; }
    venc->width = w;
    venc->height = h;
    venc->pix_fmt = AV_PIX_FMT_YUV420P;
    venc->time_base = av_d2q(1.0 / fps, 100000);
    venc->bit_rate = 4000000;
    venc->gop_size = 12;
    if (fmt->oformat->flags & AVFMT_GLOBALHEADER)
      venc->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
    if (avcodec_open2(venc, vc, nullptr) < 0) { err = -3; goto done; }
    avcodec_parameters_from_context(vst->codecpar, venc);
    vst->time_base = venc->time_base;

    if (with_audio) {
      const AVCodec* ac = avcodec_find_encoder(AV_CODEC_ID_PCM_S16LE);
      if (!ac) { err = -4; goto done; }
      ast = avformat_new_stream(fmt, ac);
      aenc = avcodec_alloc_context3(ac);
      if (!ast || !aenc) { err = -13; goto done; }
      aenc->sample_rate = sr;
      av_channel_layout_default(&aenc->ch_layout, 1);
      aenc->sample_fmt = AV_SAMPLE_FMT_S16;
      aenc->time_base = {1, sr};
      if (avcodec_open2(aenc, ac, nullptr) < 0) { err = -5; goto done; }
      avcodec_parameters_from_context(ast->codecpar, aenc);
      ast->time_base = aenc->time_base;
    }

    if (!(fmt->oformat->flags & AVFMT_NOFILE)) {
      if (avio_open(&fmt->pb, path, AVIO_FLAG_WRITE) < 0) { err = -6; goto done; }
    }
    if (avformat_write_header(fmt, nullptr) < 0) { err = -7; goto done; }

    vframe = av_frame_alloc();
    if (!vframe) { err = -14; goto done; }
    vframe->format = AV_PIX_FMT_YUV420P;
    vframe->width = w;
    vframe->height = h;
    av_frame_get_buffer(vframe, 0);
    sws = sws_getContext(w, h, AV_PIX_FMT_RGB24, w, h, AV_PIX_FMT_YUV420P,
                         SWS_BILINEAR, nullptr, nullptr, nullptr);
    if (!sws) { err = -8; goto done; }

    for (int i = 0; i < n_frames; ++i) {
      av_frame_make_writable(vframe);
      const uint8_t* src[1] = {rgb + (size_t)i * h * w * 3};
      int src_stride[1] = {w * 3};
      sws_scale(sws, src, src_stride, 0, h, vframe->data, vframe->linesize);
      vframe->pts = i;
      if (avcodec_send_frame(venc, vframe) < 0) { err = -9; goto done; }
      while (avcodec_receive_packet(venc, pkt) == 0) {
        av_packet_rescale_ts(pkt, venc->time_base, vst->time_base);
        pkt->stream_index = vst->index;
        av_interleaved_write_frame(fmt, pkt);
      }
    }
    avcodec_send_frame(venc, nullptr);
    while (avcodec_receive_packet(venc, pkt) == 0) {
      av_packet_rescale_ts(pkt, venc->time_base, vst->time_base);
      pkt->stream_index = vst->index;
      av_interleaved_write_frame(fmt, pkt);
    }

    if (with_audio) {
      const int chunk = 4096;
      aframe = av_frame_alloc();
      if (!aframe) { err = -15; goto done; }
      aframe->format = AV_SAMPLE_FMT_S16;
      av_channel_layout_default(&aframe->ch_layout, 1);
      aframe->sample_rate = sr;
      long written = 0;
      while (written < n_samples) {
        int ns = (int)((n_samples - written) < chunk ? (n_samples - written)
                                                     : chunk);
        aframe->nb_samples = ns;
        av_frame_get_buffer(aframe, 0);
        av_frame_make_writable(aframe);
        int16_t* smp = (int16_t*)aframe->data[0];
        for (int i = 0; i < ns; ++i) {
          float v = pcm[written + i];
          if (v > 1.0f) v = 1.0f;
          if (v < -1.0f) v = -1.0f;
          smp[i] = (int16_t)(v * 32000.0f);
        }
        aframe->pts = written;
        if (avcodec_send_frame(aenc, aframe) < 0) { err = -10; goto done; }
        while (avcodec_receive_packet(aenc, pkt) == 0) {
          av_packet_rescale_ts(pkt, aenc->time_base, ast->time_base);
          pkt->stream_index = ast->index;
          av_interleaved_write_frame(fmt, pkt);
        }
        written += ns;
        av_frame_unref(aframe);
        aframe->format = AV_SAMPLE_FMT_S16;
        av_channel_layout_default(&aframe->ch_layout, 1);
        aframe->sample_rate = sr;
      }
      avcodec_send_frame(aenc, nullptr);
      while (avcodec_receive_packet(aenc, pkt) == 0) {
        av_packet_rescale_ts(pkt, aenc->time_base, ast->time_base);
        pkt->stream_index = ast->index;
        av_interleaved_write_frame(fmt, pkt);
      }
    }
    av_write_trailer(fmt);
  }

done:
  if (sws) sws_freeContext(sws);
  if (venc) avcodec_free_context(&venc);
  if (aenc) avcodec_free_context(&aenc);
  if (vframe) av_frame_free(&vframe);
  if (aframe) av_frame_free(&aframe);
  if (pkt) av_packet_free(&pkt);
  if (fmt) {
    if (!(fmt->oformat->flags & AVFMT_NOFILE) && fmt->pb) avio_closep(&fmt->pb);
    avformat_free_context(fmt);
  }
  return err;
}

// ---------------------------------------------------------------------------
// Batched crop + resize of decoded RGB frames (the hot host-side transform).
// rects: t * 4 ints (top, left, crop_h, crop_w) per frame; bilinear resize of
// each cropped region to (out_h, out_w). libswscale SIMD, GIL-free via ctypes.
// ---------------------------------------------------------------------------

extern "C" int avdec_crop_resize_rgb(const unsigned char* in, int t, int h,
                                     int w, const int* rects,
                                     unsigned char* out, int out_h, int out_w) {
  SwsContext* sws = nullptr;
  int last_cw = -1, last_ch = -1;
  const size_t in_frame = (size_t)h * w * 3;
  const size_t out_frame = (size_t)out_h * out_w * 3;
  for (int i = 0; i < t; ++i) {
    int top = rects[i * 4 + 0];
    int left = rects[i * 4 + 1];
    int ch = rects[i * 4 + 2];
    int cw = rects[i * 4 + 3];
    if (top < 0 || left < 0 || ch <= 0 || cw <= 0 || top + ch > h ||
        left + cw > w)
      return -40;
    if (ch != last_ch || cw != last_cw) {
      if (sws) sws_freeContext(sws);
      sws = sws_getContext(cw, ch, AV_PIX_FMT_RGB24, out_w, out_h,
                           AV_PIX_FMT_RGB24, SWS_BILINEAR, nullptr, nullptr,
                           nullptr);
      if (!sws) return -41;
      last_ch = ch;
      last_cw = cw;
    }
    const uint8_t* src[1] = {in + i * in_frame + ((size_t)top * w + left) * 3};
    int src_stride[1] = {w * 3};
    uint8_t* dst[1] = {out + i * out_frame};
    int dst_stride[1] = {out_w * 3};
    sws_scale(sws, src, src_stride, 0, ch, dst, dst_stride);
  }
  if (sws) sws_freeContext(sws);
  return 0;
}
