/* TEST-ONLY reference shim over the system FFmpeg 5.1 libraries
 * (libavcodec/libavformat/libavutil): encodes reference vectors and
 * decodes as an independent oracle for f9tpu's from-scratch codecs —
 * the role libvorbis plays in tests/vorbis_ref.py.  The PRODUCT code
 * never links or calls any of this.
 *
 * Built on demand by tests/avref.py:
 *   g++ -O2 -shared -fPIC -o libavref.so avref.c -lavcodec -lavformat -lavutil
 */

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/channel_layout.h>
#include <libavutil/opt.h>
}
#include <string.h>

extern "C" long avref_encode(const char *, const char *, const char *,
                             const int32_t *, int, long, int, int);
extern "C" long avref_encode2(const char *, const char *, const char *,
                              const int32_t *, int, long, int, int,
                              long, const char *);
extern "C" long avref_decode(const char *, int32_t *, long, int *, int *,
                             int *);

/* Encode interleaved int32 samples (values are `bits`-bit integers) with
 * the named codec.  If `path` is non-NULL the packets are muxed into the
 * container `fmt` at `path` (e.g. alac -> "ipod" for .m4a, "caf" for
 * .caf); otherwise only the compressed byte total is accumulated.
 * Returns total compressed bytes, or a negative error. */
long avref_encode(const char *codec_name, const char *path, const char *fmt,
                  const int32_t *pcm, int ch, long n, int rate, int bits) {
    return avref_encode2(codec_name, path, fmt, pcm, ch, n, rate, bits,
                         0, NULL);
}

/* As avref_encode, plus an explicit bit rate (0 = codec default) and an
 * AVDictionary options string ("key=val:key=val", passed to
 * avcodec_open2 — e.g. libmp3lame "abr=1", mp2 "b=..."). */
long avref_encode2(const char *codec_name, const char *path, const char *fmt,
                   const int32_t *pcm, int ch, long n, int rate, int bits,
                   long bit_rate, const char *opts) {
    const AVCodec *codec = avcodec_find_encoder_by_name(codec_name);
    if (!codec) return -1;
    AVCodecContext *cc = avcodec_alloc_context3(codec);
    if (!cc) return -2;
    enum AVSampleFormat want = codec->sample_fmts ? codec->sample_fmts[0]
                                                  : AV_SAMPLE_FMT_S32;
    /* prefer a 32-bit integer fmt when offered (24-bit material); fall
     * back to whatever the codec lists first (float for aac/f32 pcm) */
    if (codec->sample_fmts) {
        for (int i = 0; codec->sample_fmts[i] != AV_SAMPLE_FMT_NONE; ++i) {
            enum AVSampleFormat f = codec->sample_fmts[i];
            if (bits > 16 && (f == AV_SAMPLE_FMT_S32 || f == AV_SAMPLE_FMT_S32P)) {
                want = f; break;
            }
            if (bits <= 16 && (f == AV_SAMPLE_FMT_S16 || f == AV_SAMPLE_FMT_S16P)) {
                want = f; break;
            }
        }
    }
    cc->sample_fmt = want;
    cc->sample_rate = rate;
    cc->bits_per_raw_sample = bits;
    av_channel_layout_default(&cc->ch_layout, ch);
    if (bit_rate > 0) cc->bit_rate = bit_rate;
    long total = -3;
    AVFormatContext *oc = NULL;
    AVStream *st = NULL;
    AVFrame *frame = NULL;
    AVPacket *pkt = NULL;
    AVDictionary *d = NULL;
    if (opts && av_dict_parse_string(&d, opts, "=", ":", 0) < 0) goto done0;
    if (avcodec_open2(cc, codec, &d) < 0) { av_dict_free(&d); goto done0; }
    av_dict_free(&d);
    if (path) {
        cc->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;  /* mp4 wants extradata */
        /* reopen with the flag (must be set before open); cheap: redo */
        avcodec_free_context(&cc);
        cc = avcodec_alloc_context3(codec);
        if (!cc) return -2;
        cc->sample_fmt = want;
        cc->sample_rate = rate;
        cc->bits_per_raw_sample = bits;
        av_channel_layout_default(&cc->ch_layout, ch);
        if (bit_rate > 0) cc->bit_rate = bit_rate;
        cc->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
        d = NULL;
        if (opts && av_dict_parse_string(&d, opts, "=", ":", 0) < 0)
            goto done0;
        if (avcodec_open2(cc, codec, &d) < 0) { av_dict_free(&d); goto done0; }
        av_dict_free(&d);
        if (avformat_alloc_output_context2(&oc, NULL, fmt, path) < 0)
            goto done0;
        st = avformat_new_stream(oc, NULL);
        if (!st) goto done;
        if (avcodec_parameters_from_context(st->codecpar, cc) < 0) goto done;
        st->time_base = (AVRational){1, rate};
        if (!(oc->oformat->flags & AVFMT_NOFILE))
            if (avio_open(&oc->pb, path, AVIO_FLAG_WRITE) < 0) goto done;
        if (avformat_write_header(oc, NULL) < 0) goto done;
    }
    frame = av_frame_alloc();
    pkt = av_packet_alloc();
    if (!frame || !pkt) goto done;
    total = 0;
    {
        const int fsz = cc->frame_size > 0 ? cc->frame_size : 4096;
        long pos = 0;
        int64_t pts = 0;
        for (;;) {
            long todo = n - pos;
            if (todo > fsz) todo = fsz;
            int ret;
            if (todo > 0) {
                frame->nb_samples = (int)todo;
                frame->format = want;
                av_channel_layout_copy(&frame->ch_layout, &cc->ch_layout);
                if (av_frame_get_buffer(frame, 0) < 0) { total = -4; break; }
                const int planar = av_sample_fmt_is_planar(want);
                const int s16 = (want == AV_SAMPLE_FMT_S16
                                 || want == AV_SAMPLE_FMT_S16P);
                const int flt = (want == AV_SAMPLE_FMT_FLT
                                 || want == AV_SAMPLE_FMT_FLTP);
                const int shift = s16 ? (bits > 16 ? bits - 16 : 0)
                                      : (32 - bits);
                const float fscale = 1.0f / (float)(1u << (bits - 1));
                for (int c = 0; c < ch; ++c) {
                    for (long i = 0; i < todo; ++i) {
                        int32_t v = pcm[(pos + i) * ch + c];
                        uint8_t *base = planar ? frame->data[c]
                                               : frame->data[0];
                        const long idx = planar ? i : (long)i * ch + c;
                        if (flt)
                            ((float *)base)[idx] = (float)v * fscale;
                        else if (s16)
                            ((int16_t *)base)[idx] =
                                (int16_t)(shift ? (v >> shift) : v);
                        else
                            ((int32_t *)base)[idx] = v << shift;
                    }
                }
                frame->pts = pts;
                pts += todo;
                ret = avcodec_send_frame(cc, frame);
                av_frame_unref(frame);
            } else {
                ret = avcodec_send_frame(cc, NULL);  /* flush */
            }
            if (ret < 0) { total = -5; break; }
            for (;;) {
                ret = avcodec_receive_packet(cc, pkt);
                if (ret == AVERROR(EAGAIN) || ret == AVERROR_EOF) break;
                if (ret < 0) { total = -6; goto done; }
                total += pkt->size;
                if (oc) {
                    av_packet_rescale_ts(pkt, cc->time_base, st->time_base);
                    pkt->stream_index = st->index;
                    if (av_interleaved_write_frame(oc, pkt) < 0) {
                        total = -7; goto done;
                    }
                } else {
                    av_packet_unref(pkt);
                }
            }
            if (todo <= 0) break;
            pos += todo;
        }
    }
done:
    if (oc && total >= 0) av_write_trailer(oc);
    if (oc) {
        if (!(oc->oformat->flags & AVFMT_NOFILE) && oc->pb)
            avio_closep(&oc->pb);
        avformat_free_context(oc);
    }
done0:
    if (frame) av_frame_free(&frame);
    if (pkt) av_packet_free(&pkt);
    avcodec_free_context(&cc);
    return total;
}

/* Decode any audio file via avformat+avcodec to interleaved int32 at the
 * stream's own bit depth (returned via bits_out; float streams report 0
 * and are scaled to 24-bit).  Returns frames decoded or negative error. */
long avref_decode(const char *path, int32_t *out, long cap, int *ch_out,
                  int *rate_out, int *bits_out) {
    AVFormatContext *ic = NULL;
    if (avformat_open_input(&ic, path, NULL, NULL) < 0) return -1;
    long got = -2;
    AVCodecContext *cc = NULL;
    AVFrame *frame = NULL;
    AVPacket *pkt = NULL;
    int sidx = -1;
    if (avformat_find_stream_info(ic, NULL) < 0) goto done;
    for (unsigned i = 0; i < ic->nb_streams; ++i)
        if (ic->streams[i]->codecpar->codec_type == AVMEDIA_TYPE_AUDIO) {
            sidx = (int)i;
            break;
        }
    if (sidx < 0) { got = -3; goto done; }
    {
        AVCodecParameters *par = ic->streams[sidx]->codecpar;
        const AVCodec *dec = avcodec_find_decoder(par->codec_id);
        if (!dec) { got = -4; goto done; }
        cc = avcodec_alloc_context3(dec);
        if (!cc || avcodec_parameters_to_context(cc, par) < 0) {
            got = -5; goto done;
        }
        if (avcodec_open2(cc, dec, NULL) < 0) { got = -6; goto done; }
    }
    frame = av_frame_alloc();
    pkt = av_packet_alloc();
    if (!frame || !pkt) { got = -7; goto done; }
    got = 0;
    {
        int draining = 0;
        for (;;) {
            int ret;
            if (!draining) {
                ret = av_read_frame(ic, pkt);
                if (ret < 0) {
                    draining = 1;
                    avcodec_send_packet(cc, NULL);
                } else if (pkt->stream_index != sidx) {
                    av_packet_unref(pkt);
                    continue;
                } else {
                    ret = avcodec_send_packet(cc, pkt);
                    av_packet_unref(pkt);
                    if (ret < 0) { got = -8; break; }
                }
            }
            for (;;) {
                ret = avcodec_receive_frame(cc, frame);
                if (ret == AVERROR(EAGAIN)) break;
                if (ret == AVERROR_EOF) goto flushed;
                if (ret < 0) { got = -9; goto done; }
                const int ch = cc->ch_layout.nb_channels;
                const enum AVSampleFormat f = (enum AVSampleFormat)frame->format;
                const int planar = av_sample_fmt_is_planar(f);
                int bits = cc->bits_per_raw_sample;
                if (!bits) bits = 8 * av_get_bytes_per_sample(f);
                if (bits > 32) bits = 32;
                *ch_out = ch;
                *rate_out = cc->sample_rate;
                *bits_out = bits;
                const int bytes = av_get_bytes_per_sample(f);
                for (int i = 0; i < frame->nb_samples; ++i) {
                    if (got >= cap) goto flushed;
                    for (int c = 0; c < ch; ++c) {
                        const uint8_t *base = planar ? frame->data[c]
                                                     : frame->data[0];
                        const long idx = planar ? i : (long)i * ch + c;
                        int32_t v = 0;
                        if (bytes == 2)
                            v = ((const int16_t *)base)[idx];
                        else if (bytes == 4 && (f == AV_SAMPLE_FMT_S32
                                                || f == AV_SAMPLE_FMT_S32P))
                            v = ((const int32_t *)base)[idx] >> (32 - bits);
                        else if (bytes == 4) { /* float: 24-bit convention */
                            v = (int32_t)(((const float *)base)[idx]
                                          * 8388608.0f);
                            *bits_out = 24;
                        }
                        out[got * ch + c] = v;
                    }
                    ++got;
                }
            }
            if (draining) break;
        }
    }
flushed:
done:
    if (frame) av_frame_free(&frame);
    if (pkt) av_packet_free(&pkt);
    if (cc) avcodec_free_context(&cc);
    if (ic) avformat_close_input(&ic);
    return got;
}

/* Decode a raw MPEG-audio elementary stream with the named codec
 * ("mp1float"/"mp2float"/"mp3float"), one fixed-size frame per packet —
 * bypasses avformat entirely, so hand-assembled conformance frames are
 * immune to the format prober's content heuristics.  Output is
 * interleaved 24-bit codes (float decoders).  Returns frames decoded or
 * a negative error. */
extern "C" long avref_decode_raw(const char *codec_name, const uint8_t *data,
                                 long len, long frame_bytes, int32_t *out,
                                 long cap, int *ch_out, int *rate_out);
long avref_decode_raw(const char *codec_name, const uint8_t *data, long len,
                      long frame_bytes, int32_t *out, long cap,
                      int *ch_out, int *rate_out) {
    const AVCodec *dec = avcodec_find_decoder_by_name(codec_name);
    if (!dec) return -1;
    AVCodecContext *cc = avcodec_alloc_context3(dec);
    if (!cc) return -2;
    long got = -3;
    AVFrame *frame = av_frame_alloc();
    AVPacket *pkt = av_packet_alloc();
    if (!frame || !pkt) goto done;
    if (avcodec_open2(cc, dec, NULL) < 0) goto done;
    got = 0;
    {
        long off = 0;
        int draining = 0;
        for (;;) {
            int ret;
            if (!draining) {
                if (off >= len) {
                    draining = 1;
                    avcodec_send_packet(cc, NULL);
                } else {
                    long n = frame_bytes;
                    if (off + n > len) n = len - off;
                    if (av_new_packet(pkt, (int)n) < 0) { got = -4; break; }
                    memcpy(pkt->data, data + off, n);
                    off += n;
                    ret = avcodec_send_packet(cc, pkt);
                    av_packet_unref(pkt);
                    if (ret < 0) { got = -5; break; }
                }
            }
            for (;;) {
                ret = avcodec_receive_frame(cc, frame);
                if (ret == AVERROR(EAGAIN)) break;
                if (ret == AVERROR_EOF) goto flushed;
                if (ret < 0) { got = -6; goto done; }
                const int ch = cc->ch_layout.nb_channels;
                const enum AVSampleFormat f =
                    (enum AVSampleFormat)frame->format;
                const int planar = av_sample_fmt_is_planar(f);
                const int bytes = av_get_bytes_per_sample(f);
                *ch_out = ch;
                *rate_out = cc->sample_rate;
                for (int i = 0; i < frame->nb_samples; ++i) {
                    if (got >= cap) goto flushed;
                    for (int c = 0; c < ch; ++c) {
                        const uint8_t *base = planar ? frame->data[c]
                                                     : frame->data[0];
                        const long idx = planar ? i : (long)i * ch + c;
                        int32_t v = 0;
                        if (bytes == 2)
                            v = ((const int16_t *)base)[idx] << 8;
                        else if (bytes == 4 && (f == AV_SAMPLE_FMT_S32
                                                || f == AV_SAMPLE_FMT_S32P))
                            v = ((const int32_t *)base)[idx] >> 8;
                        else if (bytes == 4)
                            v = (int32_t)(((const float *)base)[idx]
                                          * 8388608.0f);
                        out[got * ch + c] = v;
                    }
                    ++got;
                }
            }
            if (draining) break;
        }
    }
flushed:
done:
    if (frame) av_frame_free(&frame);
    if (pkt) av_packet_free(&pkt);
    avcodec_free_context(&cc);
    return got;
}
