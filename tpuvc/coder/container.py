"""Binary bitstream containers for coded frames.

Layout-compatible with the reference's B-frame container (E7;
/root/reference/LHBDC/encode_B.py:114-126 and decode_B.py:88-104):

  uint32 rate_id (lambda for LHBDC, packed (n, l) for Flex-Rate)
  uint16 x2 mv z-shape (h, w)
  uint32 mv y-string length
  uint32 mv z-string length
  uint16 x2 residual z-shape
  uint32 residual y-string length
  raw bytes: mv_y | mv_z | res_y | res_z   (res_z runs to EOF)

All integers little-endian.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field


@dataclass
class BFrameBitstream:
    rate_id: int
    mv_shape: tuple[int, int]
    res_shape: tuple[int, int]
    mv_y: bytes
    mv_z: bytes
    res_y: bytes
    res_z: bytes

    HEADER_BYTES = 24  # struct.calcsize("<IHHIIHHI")

    @property
    def num_bytes(self) -> int:
        return self.HEADER_BYTES + len(self.mv_y) + len(self.mv_z) + len(
            self.res_y
        ) + len(self.res_z)

    def serialize(self) -> bytes:
        head = struct.pack(
            "<IHHIIHHI",
            self.rate_id,
            self.mv_shape[0],
            self.mv_shape[1],
            len(self.mv_y),
            len(self.mv_z),
            self.res_shape[0],
            self.res_shape[1],
            len(self.res_y),
        )
        return head + self.mv_y + self.mv_z + self.res_y + self.res_z

    @classmethod
    def deserialize(cls, blob: bytes) -> "BFrameBitstream":
        rate_id, mh, mw, n_mvy, n_mvz, rh, rw, n_resy = struct.unpack(
            "<IHHIIHHI", blob[: cls.HEADER_BYTES]
        )
        off = cls.HEADER_BYTES
        mv_y = blob[off : off + n_mvy]
        off += n_mvy
        mv_z = blob[off : off + n_mvz]
        off += n_mvz
        res_y = blob[off : off + n_resy]
        off += n_resy
        res_z = blob[off:]
        return cls(
            rate_id=rate_id,
            mv_shape=(mh, mw),
            res_shape=(rh, rw),
            mv_y=mv_y,
            mv_z=mv_z,
            res_y=res_y,
            res_z=res_z,
        )


@dataclass
class VFrameBitstream:
    """Generic coded-frame container for the v3/v4 multi-stream codecs.

    Carries the per-frame side info the decoder cannot derive from the
    references alone (rate level s as milli-fixed-point, the adaptive
    down_ratio, temporal scales as centi-fixed-point, latent z shape) plus an
    ordered list of byte streams (z + per-group anchor/non-anchor strings
    for each of the two conditional codecs).

    Layout (little-endian):
      uint32 s_milli | uint8 down_ratio | int16 scale1_centi |
      int16 scale2_centi | uint16 zh | uint16 zw | uint16 n_streams |
      uint32 lengths[n_streams] | stream bytes...
    """

    s_milli: int
    down_ratio: int
    scale1_centi: int
    scale2_centi: int
    z_shape: tuple[int, int]
    streams: list = field(default_factory=list)

    HEADER = "<IBhhHHH"

    @property
    def num_bytes(self) -> int:
        return (
            struct.calcsize(self.HEADER)
            + 4 * len(self.streams)
            + sum(len(s) for s in self.streams)
        )

    def serialize(self) -> bytes:
        head = struct.pack(
            self.HEADER,
            self.s_milli,
            self.down_ratio,
            self.scale1_centi,
            self.scale2_centi,
            self.z_shape[0],
            self.z_shape[1],
            len(self.streams),
        )
        lens = struct.pack(f"<{len(self.streams)}I", *[len(s) for s in self.streams])
        return head + lens + b"".join(self.streams)

    @classmethod
    def deserialize(cls, blob: bytes) -> "VFrameBitstream":
        hsize = struct.calcsize(cls.HEADER)
        s_milli, dr, s1, s2, zh, zw, n = struct.unpack(cls.HEADER, blob[:hsize])
        lens = struct.unpack(f"<{n}I", blob[hsize : hsize + 4 * n])
        off = hsize + 4 * n
        streams = []
        for L in lens:
            streams.append(blob[off : off + L])
            off += L
        return cls(
            s_milli=s_milli,
            down_ratio=dr,
            scale1_centi=s1,
            scale2_centi=s2,
            z_shape=(zh, zw),
            streams=streams,
        )


@dataclass
class PFrameBitstream:
    """Coded P-frame container for the OJSP-style DMC codec.

    Mirrors the reference's stream writer (OJSP2025/video_model.py:463-503 +
    DCVC write_ip): per-frame side info the decoder needs — rate level q
    (milli fixed-point, the q_index analog), the chosen fractional
    down-sampling ratio (centi fixed-point, 1.00..8.75), latent z shape —
    followed by the rANS streams in write order: mv-y four-part streams
    0-3, mv z, frame-y four-part streams 0-3, frame z (the reference's
    encoder writes mv before y the same way, video_model.py:432-443).

    Layout (little-endian):
      uint32 q_milli | uint16 ratio_centi | uint16 zh | uint16 zw |
      uint8 n_streams | uint32 lengths[n] | stream bytes...
    """

    q_milli: int
    ratio_centi: int
    z_shape: tuple[int, int]
    streams: list = field(default_factory=list)

    HEADER = "<IHHHB"

    @property
    def num_bytes(self) -> int:
        return (
            struct.calcsize(self.HEADER)
            + 4 * len(self.streams)
            + sum(len(s) for s in self.streams)
        )

    def serialize(self) -> bytes:
        head = struct.pack(
            self.HEADER,
            self.q_milli,
            self.ratio_centi,
            self.z_shape[0],
            self.z_shape[1],
            len(self.streams),
        )
        lens = struct.pack(
            f"<{len(self.streams)}I", *[len(s) for s in self.streams]
        )
        return head + lens + b"".join(self.streams)

    @classmethod
    def deserialize(cls, blob: bytes) -> "PFrameBitstream":
        hsize = struct.calcsize(cls.HEADER)
        q_milli, rc, zh, zw, n = struct.unpack(cls.HEADER, blob[:hsize])
        lens = struct.unpack(f"<{n}I", blob[hsize : hsize + 4 * n])
        off = hsize + 4 * n
        streams = []
        for L in lens:
            streams.append(blob[off : off + L])
            off += L
        return cls(
            q_milli=q_milli, ratio_centi=rc, z_shape=(zh, zw),
            streams=streams,
        )


@dataclass
class IFrameBitstream:
    """Coded intra frame: the ELIC stream set (10 group strings + z).

    The reference never defines an I-frame container (its eval uses
    likelihood bits and its encode_B CLI codes only B-frames); this wraps
    tpuvc's ELICCoder.compress output so intra frames can ride the same
    sequence-level files as inter frames.

    Layout (little-endian):
      uint16 zh | uint16 zw | uint8 n_streams | uint32 lengths[n] | bytes...
    The z string is always the last stream.
    """

    z_shape: tuple[int, int]
    streams: list = field(default_factory=list)

    HEADER = "<HHB"

    def serialize(self) -> bytes:
        head = struct.pack(
            self.HEADER, self.z_shape[0], self.z_shape[1], len(self.streams)
        )
        lens = struct.pack(
            f"<{len(self.streams)}I", *[len(s) for s in self.streams]
        )
        return head + lens + b"".join(self.streams)

    @classmethod
    def deserialize(cls, blob: bytes) -> "IFrameBitstream":
        hsize = struct.calcsize(cls.HEADER)
        zh, zw, n = struct.unpack(cls.HEADER, blob[:hsize])
        lens = struct.unpack(f"<{n}I", blob[hsize : hsize + 4 * n])
        off = hsize + 4 * n
        streams = []
        for L in lens:
            streams.append(blob[off : off + L])
            off += L
        return cls(z_shape=(zh, zw), streams=streams)

    @classmethod
    def from_compress(cls, out: dict) -> "IFrameBitstream":
        """Wrap an ELICCoder.compress result dict."""
        y_strings, z_string = out["strings"]
        return cls(
            z_shape=tuple(int(v) for v in out["shape"]),
            streams=list(y_strings) + [z_string],
        )

    def to_strings(self):
        """-> (y_strings, z_string) for ELICCoder.decompress."""
        return list(self.streams[:-1]), self.streams[-1]


@dataclass
class PSequenceBitstream:
    """Whole low-delay coded sequence: I-frames (ELIC) + chained P-frames
    (DMC), the file the OJSP-style encode/decode CLIs exchange.

    Layout: b"TPS1" | uint16 width | uint16 height | uint16 n_frames |
    per frame: uint8 type (0=I, 1=P) | uint32 length | blob.
    width/height are the *unpadded* display size; frames are coded padded
    to x64 and cropped on decode.
    """

    width: int
    height: int
    frames: list = field(default_factory=list)  # [(type_str, blob)]

    MAGIC = b"TPS1"
    HEADER = "<4sHHH"

    @property
    def num_bytes(self) -> int:
        return struct.calcsize(self.HEADER) + sum(
            5 + len(b) for _, b in self.frames
        )

    def serialize(self) -> bytes:
        out = [
            struct.pack(
                self.HEADER, self.MAGIC, self.width, self.height,
                len(self.frames),
            )
        ]
        for typ, blob in self.frames:
            out.append(struct.pack("<BI", 0 if typ == "I" else 1, len(blob)))
            out.append(blob)
        return b"".join(out)

    @classmethod
    def deserialize(cls, blob: bytes) -> "PSequenceBitstream":
        hsize = struct.calcsize(cls.HEADER)
        magic, w, h, n = struct.unpack(cls.HEADER, blob[:hsize])
        if magic != cls.MAGIC:
            raise ValueError(f"bad sequence magic: {magic!r}")
        off = hsize
        frames = []
        for _ in range(n):
            t, L = struct.unpack("<BI", blob[off : off + 5])
            off += 5
            frames.append(("I" if t == 0 else "P", blob[off : off + L]))
            off += L
        return cls(width=w, height=h, frames=frames)


B_FAMILY_IDS = {"lhbdc": 0, "flexrate": 1, "deform_b": 2, "flowguided_b": 3}
B_FAMILY_NAMES = {v: k for k, v in B_FAMILY_IDS.items()}


@dataclass
class VSequenceBitstream:
    """Whole hierarchically-coded sequence: ELIC I-frames + B-frames from
    one of the four B codec families, the file exchanged by
    ``tpuvc.cli.encode_v`` / ``decode_v``.

    The reference has no sequence-level B bitstream (its encode_B/decode_B
    code one frame per file, LHBDC/encode_B.py:114-126); this container is
    the natural completion: frames ride in CODING order with their display
    index, so the decoder replays the file order through the same DPB walk
    the encoder used — no schedule side-channel.

    ``mode`` records how device graphs were shaped during encoding:
    0 = sequential (one frame per forward), 1 = level-batched with
    ``max_batch`` frames per forward. The decoder must run the SAME batch
    shapes: XLA graphs are deterministic per shape, but a B=1 and a B=4
    convolution may reduce in different orders, and the decoder re-derives
    entropy parameters from reconstructed references (LHBDC decode_B
    re-estimates flow, decode_B.py:65-77) — a shape mismatch would corrupt
    the rANS decode.

    ``dtype`` (0=float32, 1=bfloat16 mixed precision) records the layer
    compute policy active during encoding; the decoder traces its graphs
    under the same policy — like the batch shapes, the numerics must match
    for the re-derived entropy parameters to stay bit-identical.

    ``mesh`` (>=1) records how many mesh devices the encoder's level
    batches were sharded over (tpuvc.parallel.level_batch_sharder): input
    sharding is part of XLA program identity, so the decoder must place
    its batches over a same-sized mesh for the re-derived entropy
    parameters to stay bit-identical.

    Layout: b"TPV3" | uint8 family | uint16 width | uint16 height |
    uint16 gop | uint16 n_frames | uint8 mode | uint8 max_batch |
    uint8 dtype | uint8 window_gops | uint8 mesh | per frame in coding
    order: uint8 type (0=I, 1=B) | uint16 display_idx | uint32 length |
    blob. width/height are the unpadded display size. TPV2 streams (no
    mesh field) still parse, with mesh=1.
    """

    family: str
    width: int
    height: int
    gop: int
    n_frames: int
    frames: list = field(default_factory=list)  # [(type_str, idx, blob)]
    mode: int = 0
    max_batch: int = 0
    dtype: int = 0
    window_gops: int = 1
    mesh: int = 1

    MAGIC = b"TPV3"
    HEADER = "<4sBHHHHBBBBB"
    HEADER_V2 = "<4sBHHHHBBBB"

    @property
    def num_bytes(self) -> int:
        return struct.calcsize(self.HEADER) + sum(
            7 + len(b) for _, _, b in self.frames
        )

    def serialize(self) -> bytes:
        if not 1 <= max(1, self.mesh) <= 255:
            raise ValueError(
                f"mesh={self.mesh} does not fit the uint8 header field "
                "(1..255)"
            )
        out = [
            struct.pack(
                self.HEADER, self.MAGIC, B_FAMILY_IDS[self.family],
                self.width, self.height, self.gop, self.n_frames,
                self.mode, self.max_batch, self.dtype,
                max(1, self.window_gops), max(1, self.mesh),
            )
        ]
        for typ, idx, blob in self.frames:
            out.append(
                struct.pack("<BHI", 0 if typ == "I" else 1, idx, len(blob))
            )
            out.append(blob)
        return b"".join(out)

    @classmethod
    def deserialize(cls, blob: bytes) -> "VSequenceBitstream":
        if blob[:4] == b"TPV2":  # pre-mesh header, mesh=1
            hsize = struct.calcsize(cls.HEADER_V2)
            magic, fam, w, h, gop, n, mode, mb, dtype, wg = struct.unpack(
                cls.HEADER_V2, blob[:hsize]
            )
            mesh = 1
        else:
            hsize = struct.calcsize(cls.HEADER)
            magic, fam, w, h, gop, n, mode, mb, dtype, wg, mesh = (
                struct.unpack(cls.HEADER, blob[:hsize])
            )
            if magic != cls.MAGIC:
                if magic == b"TPV1":
                    raise ValueError(
                        "TPV1 stream from an older tpuvc build (no dtype "
                        "field); re-encode with this version"
                    )
                raise ValueError(f"bad sequence magic: {magic!r}")
        off = hsize
        frames = []
        for k in range(n):
            if off + 7 > len(blob):
                raise ValueError(
                    f"truncated sequence: record {k}/{n} header past EOF"
                )
            t, idx, L = struct.unpack("<BHI", blob[off : off + 7])
            off += 7
            if off + L > len(blob):
                raise ValueError(
                    f"truncated sequence: frame {idx} blob past EOF"
                )
            frames.append(
                ("I" if t == 0 else "B", idx, blob[off : off + L])
            )
            off += L
        if off != len(blob):
            raise ValueError(f"{len(blob) - off} trailing bytes")
        return cls(
            family=B_FAMILY_NAMES[fam], width=w, height=h, gop=gop,
            n_frames=n, frames=frames, mode=mode, max_batch=mb, dtype=dtype,
            window_gops=max(1, wg), mesh=max(1, mesh),
        )
