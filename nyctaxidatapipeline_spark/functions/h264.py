"""H.264/AVC Annex-B elementary-stream parser — pure stdlib, no ffmpeg.

Container-level parsing for the ``multimodal.frame_sample`` H.264 slot,
completing the codec family (PNG / JPEG incl. progressive / AVI / WAV /
MP3): REAL start-code walking, NAL unit classification, RBSP
emulation-prevention unescaping, and a full SPS parse (Exp-Golomb,
high-profile chroma/bit-depth fields, scaling lists, frame cropping) —
yielding the metadata a video pipeline filters, partitions, and
frame-samples on (dimensions, profile/level, slice/IDR offsets) WITHOUT
decoding pictures. CABAC/CAVLC slice decode remains the documented
library slot (PyAV/ffmpeg) — pixel-level features are never fabricated.

Per ITU-T H.264 §7.3 / Annex B:

  * NAL units are delimited by 3- or 4-byte start codes
    (``00 00 01`` / ``00 00 00 01``);
  * the 1-byte NAL header carries forbidden_zero_bit(1),
    nal_ref_idc(2), nal_unit_type(5) — type 5 = IDR slice,
    1 = non-IDR slice, 7 = SPS, 8 = PPS;
  * RBSP payloads unescape ``00 00 03 xx`` → ``00 00 xx``;
  * SPS yields width/height via pic_width_in_mbs / map units,
    frame_mbs_only, and chroma-scaled frame cropping offsets.
"""

from __future__ import annotations

#: nal_unit_type values this walker classifies.
NAL_SLICE = 1
NAL_IDR = 5
NAL_SEI = 6
NAL_SPS = 7
NAL_PPS = 8
NAL_AUD = 9


class _BitReader:
    """MSB-first bit reader with ue(v)/se(v) Exp-Golomb (§9.1)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0          # bit position

    def u(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self.pos >> 3
            if byte >= len(self.data):
                raise ValueError("h264: truncated RBSP")
            v = (v << 1) | ((self.data[byte] >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v

    def ue(self) -> int:
        zeros = 0
        while self.u(1) == 0:
            zeros += 1
            if zeros > 31:
                raise ValueError("h264: bad Exp-Golomb code")
        return (1 << zeros) - 1 + (self.u(zeros) if zeros else 0)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) // 2 if k % 2 else -(k // 2)


def _unescape_rbsp(data: bytes) -> bytes:
    """Strip emulation-prevention bytes: 00 00 03 -> 00 00 (§7.4.1.1)."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        if i + 2 < n and data[i] == 0 and data[i + 1] == 0 \
                and data[i + 2] == 3:
            out += b"\x00\x00"
            i += 3
        else:
            out.append(data[i])
            i += 1
    return bytes(out)


def _skip_scaling_list(br: _BitReader, size: int) -> None:
    """scaling_list() §7.3.2.1.1.1 — delta-coded, early-terminating."""
    last, nxt = 8, 8
    for _ in range(size):
        if nxt != 0:
            nxt = (last + br.se() + 256) % 256
        if nxt != 0:
            last = nxt


def parse_sps(rbsp: bytes) -> dict:
    """Parse a seq_parameter_set RBSP (already unescaped, WITHOUT the
    NAL header byte). Returns profile_idc, level_idc, width, height
    (crop-adjusted luma samples), chroma_format_idc, frame_mbs_only."""
    br = _BitReader(rbsp)
    profile = br.u(8)
    br.u(8)                                    # constraint flags + reserved
    level = br.u(8)
    br.ue()                                    # seq_parameter_set_id
    chroma = 1
    if profile in (100, 110, 122, 244, 44, 83, 86, 118, 128,
                   138, 139, 134, 135):
        chroma = br.ue()
        if chroma == 3:
            br.u(1)                            # separate_colour_plane
        br.ue()                                # bit_depth_luma_minus8
        br.ue()                                # bit_depth_chroma_minus8
        br.u(1)                                # qpprime_y_zero_transform
        if br.u(1):                            # seq_scaling_matrix_present
            n_lists = 8 if chroma != 3 else 12
            for i in range(n_lists):
                if br.u(1):                    # seq_scaling_list_present
                    _skip_scaling_list(br, 16 if i < 6 else 64)
    br.ue()                                    # log2_max_frame_num_minus4
    poc_type = br.ue()
    if poc_type == 0:
        br.ue()                                # log2_max_pic_order_cnt_lsb
    elif poc_type == 1:
        br.u(1)                                # delta_pic_order_always_zero
        br.se()                                # offset_for_non_ref_pic
        br.se()                                # offset_for_top_to_bottom
        for _ in range(br.ue()):               # num_ref_frames_in_cycle
            br.se()
    br.ue()                                    # max_num_ref_frames
    br.u(1)                                    # gaps_in_frame_num_allowed
    pw_mbs = br.ue() + 1
    ph_map = br.ue() + 1
    frame_mbs_only = br.u(1)
    if not frame_mbs_only:
        br.u(1)                                # mb_adaptive_frame_field
    br.u(1)                                    # direct_8x8_inference
    crop_l = crop_r = crop_t = crop_b = 0
    if br.u(1):                                # frame_cropping_flag
        crop_l, crop_r, crop_t, crop_b = (br.ue(), br.ue(),
                                          br.ue(), br.ue())
    # crop units per §7.4.2.1.1 (Table 6-1 sub-sampling)
    sub_w = 2 if chroma in (1, 2) else 1
    sub_h = 2 if chroma == 1 else 1
    crop_x = 1 if chroma == 0 else sub_w
    crop_y = (1 if chroma == 0 else sub_h) * (2 - frame_mbs_only)
    width = pw_mbs * 16 - crop_x * (crop_l + crop_r)
    height = (2 - frame_mbs_only) * ph_map * 16 - crop_y * (crop_t + crop_b)
    if width <= 0 or height <= 0:
        raise ValueError("h264: SPS crop exceeds coded size")
    return {"profile_idc": profile, "level_idc": level,
            "width": width, "height": height,
            "chroma_format_idc": chroma,
            "frame_mbs_only": frame_mbs_only}


def parse_h264(data: bytes) -> dict:
    """Walk an Annex-B stream. Returns width/height/profile/level from
    the first SPS plus the NAL inventory: n_nals, n_slices (types 1+5),
    n_idr, and ``slices`` — (absolute_payload_offset, nal_size,
    is_idr) per slice NAL, the frame-sampling index. Raises
    ``ValueError`` (only) on malformed input."""
    if not isinstance(data, (bytes, bytearray)):
        raise ValueError("h264: not a byte stream")
    data = bytes(data)
    # locate start codes
    starts = []                    # (payload_offset, start_code_len)
    i, n = 0, len(data)
    first = data.find(b"\x00\x00\x01")
    if first == -1:
        raise ValueError("h264: no start code")
    if first not in (0, 1) or (first == 1 and data[0] != 0):
        raise ValueError("h264: leading garbage before first start code")
    i = first
    while i != -1:
        starts.append(i + 3)
        i = data.find(b"\x00\x00\x01", i + 3)
    sps = None
    n_slices = n_idr = 0
    slices = []
    for k, off in enumerate(starts):
        end = starts[k + 1] - 3 if k + 1 < len(starts) else n
        if k + 1 < len(starts) and data[end - 1] == 0:
            end -= 1               # 4-byte start code's leading zero
        if end <= off:
            raise ValueError("h264: empty NAL unit")
        hdr = data[off]
        if hdr & 0x80:
            raise ValueError("h264: forbidden_zero_bit set")
        ntype = hdr & 0x1F
        if ntype == NAL_SPS and sps is None:
            sps = parse_sps(_unescape_rbsp(data[off + 1:end]))
        elif ntype in (NAL_SLICE, NAL_IDR):
            n_slices += 1
            n_idr += ntype == NAL_IDR
            slices.append((off, end - off, ntype == NAL_IDR))
    if sps is None:
        raise ValueError("h264: no SPS in stream")
    if not slices:
        raise ValueError("h264: no slice NALs")
    return {**sps, "n_nals": len(starts), "n_slices": n_slices,
            "n_idr": n_idr, "slices": slices}


def synth_h264_stream(width: int, height: int, n_frames: int,
                      idr_interval: int = 4,
                      slice_bytes: int = 64,
                      profile_idc: int = 66) -> bytes:
    """Build a structurally-valid Annex-B stream: SPS (with frame
    cropping when dims aren't multiples of 16) + PPS + ``n_frames``
    slice NALs (IDR every ``idr_interval``-th, starting at frame 0)
    with deterministic dummy payloads — the parser-side test twin (the
    slice payload is opaque to NAL walking, like the MP3 synthesizer's
    fill bytes). Baseline profile keeps the SPS short."""
    if width <= 0 or height <= 0 or width % 2 or height % 2:
        raise ValueError("synth: even positive dims only (chroma 4:2:0)")

    bits: list[int] = []

    def u(v, n):
        for b in range(n - 1, -1, -1):
            bits.append((v >> b) & 1)

    def ue(v):
        k = v + 1
        nb = k.bit_length()
        u(0, nb - 1)
        u(k, nb)

    # SPS RBSP
    u(profile_idc, 8)
    u(0, 8)                         # constraint flags
    u(30, 8)                        # level 3.0
    ue(0)                           # sps id
    ue(4)                           # log2_max_frame_num_minus4
    ue(0)                           # poc type 0
    ue(4)                           # log2_max_pic_order_cnt_lsb_minus4
    ue(1)                           # max_num_ref_frames
    u(0, 1)                         # gaps allowed
    mbs_w = -(-width // 16)
    mbs_h = -(-height // 16)
    ue(mbs_w - 1)
    ue(mbs_h - 1)
    u(1, 1)                         # frame_mbs_only
    u(1, 1)                         # direct_8x8
    crop_r = (mbs_w * 16 - width) // 2      # 4:2:0 crop unit x = 2
    crop_b = (mbs_h * 16 - height) // 2     # 4:2:0 crop unit y = 2
    if crop_r or crop_b:
        u(1, 1)
        ue(0); ue(crop_r); ue(0); ue(crop_b)
    else:
        u(0, 1)
    u(0, 1)                         # vui_parameters_present
    u(1, 1)                         # rbsp_stop_one_bit
    while len(bits) % 8:
        bits.append(0)
    sps_rbsp = bytes(int("".join(map(str, bits[i:i + 8])), 2)
                     for i in range(0, len(bits), 8))
    # escape emulation (unlikely with these values, but correct)
    esc = bytearray()
    zeros = 0
    for b in sps_rbsp:
        if zeros >= 2 and b <= 3:
            esc.append(3)
            zeros = 0
        esc.append(b)
        zeros = zeros + 1 if b == 0 else 0
    out = bytearray(b"\x00\x00\x00\x01" + bytes([0x67]) + bytes(esc))
    out += b"\x00\x00\x00\x01" + bytes([0x68, 0xCE, 0x38, 0x80])  # PPS
    for f in range(n_frames):
        idr = f % idr_interval == 0
        hdr = 0x65 if idr else 0x41       # ref_idc 3/2 + type 5/1
        payload = bytes((f * 31 + i * 7) % 251 + 4
                        for i in range(slice_bytes - 1))
        out += b"\x00\x00\x01" + bytes([hdr]) + payload
    return bytes(out)
