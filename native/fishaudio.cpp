// fishaudio: native audio runtime for fish_speech_tpu.
//
// Streaming Ogg/Opus encoder with a plain C ABI (consumed via ctypes).
// TPU-native counterpart of the reference's Rust opus/ogg streaming
// encoder (reference: server/lib/audio/opus.rs:12-93): 24 kHz mono
// VoIP-profile Opus at 24 kbps, 480-sample (20 ms) frames, hand-built
// OpusHead/OpusTags headers, one Ogg page flushed per encode call.
//
// libopus is linked from the system (-l:libopus.so.0); its stable public
// API is declared below (no opus headers ship in this image). The Ogg
// container layer — page framing, lacing, the 0x04C11DB7 CRC — is
// implemented here directly instead of depending on libogg.
//
// Build: make -C native   (produces libfishaudio.so)

#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <vector>

// ---------------------------------------------------------------------------
// libopus public API (stable ABI), linked against libopus.so.0
// ---------------------------------------------------------------------------

extern "C" {
typedef struct OpusEncoder OpusEncoder;
OpusEncoder *opus_encoder_create(int32_t Fs, int channels, int application,
                                 int *error);
int32_t opus_encode_float(OpusEncoder *st, const float *pcm, int frame_size,
                          unsigned char *data, int32_t max_data_bytes);
int32_t opus_encoder_ctl(OpusEncoder *st, int request, ...);
void opus_encoder_destroy(OpusEncoder *st);
const char *opus_get_version_string(void);
}

static const int OPUS_APPLICATION_VOIP = 2048;
static const int OPUS_SET_BITRATE_REQUEST = 4002;

// ---------------------------------------------------------------------------
// Ogg page writer
// ---------------------------------------------------------------------------

namespace {

uint32_t ogg_crc_table[256];
bool crc_ready = false;

void init_crc() {
  if (crc_ready) return;
  for (uint32_t i = 0; i < 256; i++) {
    uint32_t r = i << 24;
    for (int j = 0; j < 8; j++)
      r = (r & 0x80000000u) ? (r << 1) ^ 0x04c11db7u : (r << 1);
    ogg_crc_table[i] = r;
  }
  crc_ready = true;
}

uint32_t ogg_crc(const uint8_t *data, size_t len) {
  uint32_t crc = 0;
  for (size_t i = 0; i < len; i++)
    crc = (crc << 8) ^ ogg_crc_table[((crc >> 24) & 0xff) ^ data[i]];
  return crc;
}

void put_le32(std::vector<uint8_t> &v, uint32_t x) {
  v.push_back(x & 0xff);
  v.push_back((x >> 8) & 0xff);
  v.push_back((x >> 16) & 0xff);
  v.push_back((x >> 24) & 0xff);
}

void put_le64(std::vector<uint8_t> &v, uint64_t x) {
  for (int i = 0; i < 8; i++) v.push_back((x >> (8 * i)) & 0xff);
}

void put_le16(std::vector<uint8_t> &v, uint16_t x) {
  v.push_back(x & 0xff);
  v.push_back((x >> 8) & 0xff);
}

// One Ogg page holding `packets` (each its own lacing run).
std::vector<uint8_t> make_page(const std::vector<std::vector<uint8_t>> &packets,
                               uint8_t header_type, uint64_t granule,
                               uint32_t serial, uint32_t seq) {
  init_crc();
  std::vector<uint8_t> page;
  page.reserve(27 + 255 + 4096);
  const char magic[4] = {'O', 'g', 'g', 'S'};
  page.insert(page.end(), magic, magic + 4);
  page.push_back(0);            // version
  page.push_back(header_type);  // 0x02 BOS, 0x04 EOS
  put_le64(page, granule);
  put_le32(page, serial);
  put_le32(page, seq);
  size_t crc_pos = page.size();
  put_le32(page, 0);  // CRC placeholder

  // lacing
  std::vector<uint8_t> lacing;
  for (const auto &p : packets) {
    size_t n = p.size();
    while (n >= 255) {
      lacing.push_back(255);
      n -= 255;
    }
    lacing.push_back((uint8_t)n);
  }
  page.push_back((uint8_t)lacing.size());
  page.insert(page.end(), lacing.begin(), lacing.end());
  for (const auto &p : packets) page.insert(page.end(), p.begin(), p.end());

  uint32_t crc = ogg_crc(page.data(), page.size());
  page[crc_pos + 0] = crc & 0xff;
  page[crc_pos + 1] = (crc >> 8) & 0xff;
  page[crc_pos + 2] = (crc >> 16) & 0xff;
  page[crc_pos + 3] = (crc >> 24) & 0xff;
  return page;
}

struct OggOpusEncoder {
  OpusEncoder *enc = nullptr;
  int sample_rate = 24000;
  int frame_size = 480;  // 20 ms at 24 kHz
  uint32_t serial = 0x66697368;  // "fish"
  uint32_t page_seq = 0;
  uint64_t granule = 0;  // 48 kHz sample count incl. preskip
  int preskip = 312;     // opus default lookahead at 48 kHz
  std::vector<float> pending;  // buffered samples < frame_size
  std::vector<uint8_t> out;
};

}  // namespace

// ---------------------------------------------------------------------------
// C ABI
// ---------------------------------------------------------------------------

extern "C" {

void *fa_ogg_opus_create(int sample_rate, int bitrate) {
  int err = 0;
  OpusEncoder *enc =
      opus_encoder_create(sample_rate, 1, OPUS_APPLICATION_VOIP, &err);
  if (!enc || err != 0) return nullptr;
  opus_encoder_ctl(enc, OPUS_SET_BITRATE_REQUEST, bitrate);
  auto *h = new OggOpusEncoder();
  h->enc = enc;
  h->sample_rate = sample_rate;
  h->frame_size = sample_rate / 50;  // 20 ms

  // OpusHead page (BOS)
  std::vector<uint8_t> head;
  const char hmagic[8] = {'O', 'p', 'u', 's', 'H', 'e', 'a', 'd'};
  head.insert(head.end(), hmagic, hmagic + 8);
  head.push_back(1);  // version
  head.push_back(1);  // channels
  put_le16(head, (uint16_t)h->preskip);
  put_le32(head, (uint32_t)sample_rate);
  put_le16(head, 0);  // gain
  head.push_back(0);  // mapping family
  auto p1 = make_page({head}, 0x02, 0, h->serial, h->page_seq++);
  h->out.insert(h->out.end(), p1.begin(), p1.end());

  // OpusTags page
  std::vector<uint8_t> tags;
  const char tmagic[8] = {'O', 'p', 'u', 's', 'T', 'a', 'g', 's'};
  tags.insert(tags.end(), tmagic, tmagic + 8);
  const char *vendor = "fish_speech_tpu";
  put_le32(tags, (uint32_t)strlen(vendor));
  tags.insert(tags.end(), vendor, vendor + strlen(vendor));
  put_le32(tags, 0);  // no comments
  auto p2 = make_page({tags}, 0x00, 0, h->serial, h->page_seq++);
  h->out.insert(h->out.end(), p2.begin(), p2.end());
  return h;
}

// Encode PCM; appends finished Ogg pages to the internal buffer.
// Returns number of bytes now available (use fa_ogg_opus_read).
int fa_ogg_opus_encode(void *handle, const float *pcm, int n_samples,
                       int flush_partial) {
  auto *h = (OggOpusEncoder *)handle;
  h->pending.insert(h->pending.end(), pcm, pcm + n_samples);

  std::vector<std::vector<uint8_t>> packets;
  size_t off = 0;
  unsigned char buf[4096];
  while (h->pending.size() - off >= (size_t)h->frame_size) {
    int n = opus_encode_float(h->enc, h->pending.data() + off, h->frame_size,
                              buf, sizeof(buf));
    if (n < 0) return -1;
    packets.emplace_back(buf, buf + n);
    off += h->frame_size;
    h->granule += (uint64_t)h->frame_size * 48000 / h->sample_rate;
  }
  h->pending.erase(h->pending.begin(), h->pending.begin() + off);

  if (flush_partial && !h->pending.empty()) {
    // zero-pad the final short frame (reference pads the tail chunk)
    std::vector<float> last(h->frame_size, 0.0f);
    memcpy(last.data(), h->pending.data(), h->pending.size() * sizeof(float));
    int n = opus_encode_float(h->enc, last.data(), h->frame_size, buf,
                              sizeof(buf));
    if (n < 0) return -1;
    packets.emplace_back(buf, buf + n);
    h->granule += (uint64_t)h->pending.size() * 48000 / h->sample_rate;
    h->pending.clear();
  }

  if (!packets.empty()) {
    auto page = make_page(packets, flush_partial ? 0x04 : 0x00,
                          h->granule + h->preskip, h->serial, h->page_seq++);
    h->out.insert(h->out.end(), page.begin(), page.end());
  } else if (flush_partial) {
    auto page = make_page({}, 0x04, h->granule + h->preskip, h->serial,
                          h->page_seq++);
    h->out.insert(h->out.end(), page.begin(), page.end());
  }
  return (int)h->out.size();
}

int fa_ogg_opus_pending(void *handle) {
  return (int)((OggOpusEncoder *)handle)->out.size();
}

// Drain up to cap bytes of finished pages into out; returns bytes copied.
int fa_ogg_opus_read(void *handle, unsigned char *out, int cap) {
  auto *h = (OggOpusEncoder *)handle;
  int n = (int)h->out.size();
  if (n > cap) n = cap;
  memcpy(out, h->out.data(), n);
  h->out.erase(h->out.begin(), h->out.begin() + n);
  return n;
}

void fa_ogg_opus_destroy(void *handle) {
  auto *h = (OggOpusEncoder *)handle;
  if (h->enc) opus_encoder_destroy(h->enc);
  delete h;
}

const char *fa_version() { return "fishaudio-0.1"; }
}
