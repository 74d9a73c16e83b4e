"""Delta deletion-vector codec: Z85 + RoaringBitmapArray (read side).

Implements the PUBLIC formats the Delta protocol composes for deletion
vectors (delta-io PROTOCOL.md "Deletion Vectors", which in turn embeds
the public RoaringFormatSpec "portable" serialization):

- **Z85** (ZeroMQ base-85, spec 32/Z85): encodes the 16-byte UUID of a
  relative DV file ("u" storage) and the whole blob of an inline DV
  ("i" storage).
- **32-bit roaring bitmap, portable serialization**: cookie-framed
  container list (array / bitmap / run containers).
- **RoaringBitmapArray, portable**: ``[int64 LE bitmap count][each
  32-bit bitmap]`` where bitmap ``i`` carries values offset by
  ``i * 2**32`` — Delta's 64-bit extension.
- **DV blob**: ``[int32 LE magic 1681511377][RoaringBitmapArray]``.
  In a ``.bin`` DV FILE (format version byte 1 at offset 0) each blob
  sits at the descriptor's ``offset`` framed as ``[int32 BE size][blob]
  [int32 BE CRC-32 of blob]``; an INLINE descriptor Z85-encodes the
  blob directly.

Every framing field is verified (format version, magic, size,
checksum, cookie) and mismatches raise ``ValueError`` naming the field
— a misparsed deletion vector silently resurrects deleted rows, the
exact failure class this module must never have.

Scale note: a DV is bounded by the protocol's own design intent —
writers compact files whose DVs grow past a small fraction of the file
(the format caps at one bitmap per 2^32-row range, and real tables
keep DV cardinality ≪ file rows or rewrite the file). Since round 13
parsing happens IN TASKS, never on the driver: the snapshot carries
only O(files) descriptors, and ``deltalog._dv_positions_df`` /
``_dv_filter_task_side`` decode them executor-side (bounded total →
broadcast anti-join on (file, row_index); above the bound → per-file
decode inside the scan's Arrow pass).
"""

from __future__ import annotations

import struct
import uuid as _uuid
import zlib

_Z85_CHARS = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INDEX = {c: i for i, c in enumerate(_Z85_CHARS)}

DV_MAGIC = 1681511377
_SERIAL_COOKIE_NO_RUN = 12346
_SERIAL_COOKIE = 12347
_NO_OFFSET_THRESHOLD = 4


def z85_decode(text: str) -> bytes:
    """Z85 → bytes (spec 32/Z85: 5 chars → 4 bytes, big-endian base 85)."""
    if len(text) % 5:
        raise ValueError(
            f"Z85 input length {len(text)} is not a multiple of 5"
        )
    out = bytearray()
    for i in range(0, len(text), 5):
        acc = 0
        for ch in text[i : i + 5]:
            idx = _Z85_INDEX.get(ch)
            if idx is None:
                raise ValueError(f"invalid Z85 character {ch!r}")
            acc = acc * 85 + idx
        if acc > 0xFFFFFFFF:
            raise ValueError("Z85 quintet overflows 32 bits")
        out += acc.to_bytes(4, "big")
    return bytes(out)


def z85_encode(data: bytes) -> str:
    """bytes → Z85 (used by tests/fixtures; len(data) % 4 must be 0)."""
    if len(data) % 4:
        raise ValueError(f"Z85 payload length {len(data)} is not a multiple of 4")
    out = []
    for i in range(0, len(data), 4):
        acc = int.from_bytes(data[i : i + 4], "big")
        chunk = []
        for _ in range(5):
            acc, rem = divmod(acc, 85)
            chunk.append(_Z85_CHARS[rem])
        out.extend(reversed(chunk))
    return "".join(out)


def dv_relative_path(path_or_inline: str) -> str:
    """Relative-storage ("u") descriptor → table-relative file path.

    The LAST 20 characters Z85-decode to the 16-byte UUID; anything
    before them is an optional directory prefix. File name per spec:
    ``deletion_vector_<uuid>.bin``."""
    if len(path_or_inline) < 20:
        raise ValueError(
            "relative DV descriptor shorter than the 20-char Z85 uuid"
        )
    prefix, enc = path_or_inline[:-20], path_or_inline[-20:]
    u = _uuid.UUID(bytes=z85_decode(enc))
    name = f"deletion_vector_{u}.bin"
    return f"{prefix}/{name}" if prefix else name


def _parse_roaring32(buf: bytes, pos: int) -> tuple[list[int], int]:
    """One 32-bit roaring bitmap (portable) → (sorted values, new pos)."""
    (cookie,) = struct.unpack_from("<i", buf, pos)
    if (cookie & 0xFFFF) == _SERIAL_COOKIE:
        n_containers = (cookie >> 16) + 1
        pos += 4
        run_flag_bytes = (n_containers + 7) // 8
        run_flags = buf[pos : pos + run_flag_bytes]
        pos += run_flag_bytes
        has_offsets = n_containers >= _NO_OFFSET_THRESHOLD
    elif cookie == _SERIAL_COOKIE_NO_RUN:
        (n_containers,) = struct.unpack_from("<i", buf, pos + 4)
        pos += 8
        run_flags = b"\x00" * ((n_containers + 7) // 8)
        has_offsets = True
    else:
        raise ValueError(f"bad roaring cookie {cookie & 0xFFFFFFFF:#x}")
    keys: list[int] = []
    cards: list[int] = []
    for i in range(n_containers):
        key, card_m1 = struct.unpack_from("<HH", buf, pos)
        pos += 4
        keys.append(key)
        cards.append(card_m1 + 1)
    if has_offsets:
        pos += 4 * n_containers  # offsets are redundant for linear parse
    values: list[int] = []
    for i in range(n_containers):
        base = keys[i] << 16
        is_run = bool(run_flags[i // 8] & (1 << (i % 8)))
        if is_run:
            (n_runs,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            for _ in range(n_runs):
                start, length_m1 = struct.unpack_from("<HH", buf, pos)
                pos += 4
                values.extend(base + v for v in range(start, start + length_m1 + 1))
        elif cards[i] <= 4096:
            vals = struct.unpack_from(f"<{cards[i]}H", buf, pos)
            pos += 2 * cards[i]
            values.extend(base + v for v in vals)
        else:
            words = struct.unpack_from("<1024Q", buf, pos)
            pos += 8192
            for wi, w in enumerate(words):
                while w:
                    low = w & -w
                    values.append(base + (wi << 6) + low.bit_length() - 1)
                    w ^= low
    return values, pos


def parse_dv_blob(data: bytes) -> list[int]:
    """DV blob (magic + RoaringBitmapArray) → sorted deleted row indexes."""
    if len(data) < 12:
        raise ValueError(f"DV blob too short ({len(data)} bytes)")
    (magic,) = struct.unpack_from("<i", data, 0)
    if magic != DV_MAGIC:
        raise ValueError(f"bad DV magic {magic} (expected {DV_MAGIC})")
    (n_bitmaps,) = struct.unpack_from("<q", data, 4)
    if n_bitmaps < 0 or n_bitmaps > 1 << 20:
        raise ValueError(f"implausible DV bitmap count {n_bitmaps}")
    pos = 12
    out: list[int] = []
    for i in range(n_bitmaps):
        vals, pos = _parse_roaring32(data, pos)
        high = i << 32
        out.extend(high + v for v in vals)
    if pos != len(data):
        raise ValueError(
            f"trailing bytes after DV bitmaps ({len(data) - pos} unread)"
        )
    return out


def read_dv_from_file(path: str, offset: int, size_in_bytes: int) -> list[int]:
    """One DV from a ``.bin`` file: verify the format version byte, the
    size frame at ``offset``, and the CRC-32 trailer, then parse."""
    with open(path, "rb") as fh:
        version = fh.read(1)
        if version != b"\x01":
            raise ValueError(
                f"unsupported DV file format version {version!r} in {path}"
            )
        fh.seek(offset)
        (size,) = struct.unpack(">i", fh.read(4))
        if size != size_in_bytes:
            raise ValueError(
                f"DV size mismatch in {path}@{offset}: frame says {size}, "
                f"descriptor says {size_in_bytes}"
            )
        data = fh.read(size)
        if len(data) != size:
            raise ValueError(f"truncated DV in {path}@{offset}")
        (crc,) = struct.unpack(">I", fh.read(4))
    actual = zlib.crc32(data) & 0xFFFFFFFF
    if crc != actual:
        raise ValueError(
            f"DV checksum mismatch in {path}@{offset}: "
            f"stored {crc:#010x}, computed {actual:#010x}"
        )
    return parse_dv_blob(data)


#: per-PROCESS decode-call counter: the read path decodes bitmaps only
#: in TASKS (separate Python worker processes), so a driver-process
#: reading of this counter staying flat across a scan PROVES no driver
#: decode happened — ``tools/lakehouse_stress.py`` pins it against a
#: synthetic million-position DV (round 13, mirror of the write side's
#: ``deltalog._LAST_DV_DRIVER_ROWS``)
_DECODE_CALLS = 0


def deleted_row_indexes(table_path: str, descriptor: dict) -> list[int]:
    """Delta ``deletionVector`` descriptor → sorted deleted row indexes.

    Supports storageType "i" (inline Z85 blob), "u" (table-relative
    ``.bin`` file, Z85 uuid name), and "p" (absolute path)."""
    import os

    global _DECODE_CALLS
    _DECODE_CALLS += 1
    st = descriptor.get("storageType")
    poi = descriptor.get("pathOrInlineDv", "")
    if st == "i":
        data = z85_decode(poi)
        size = int(descriptor.get("sizeInBytes", len(data)))
        # Z85 works in 4-byte quanta, so an inline blob whose true length
        # (sizeInBytes) is not a multiple of 4 arrives zero-padded;
        # anything beyond 3 pad bytes is a corrupt descriptor
        if not (size <= len(data) < size + 4):
            raise ValueError(
                f"inline DV size mismatch: decoded {len(data)} bytes, "
                f"descriptor says {size}"
            )
        vals = parse_dv_blob(data[:size])
    elif st == "u":
        rel = dv_relative_path(poi)
        vals = read_dv_from_file(
            os.path.join(table_path, rel),
            int(descriptor["offset"]),
            int(descriptor["sizeInBytes"]),
        )
    elif st == "p":
        vals = read_dv_from_file(
            poi, int(descriptor["offset"]), int(descriptor["sizeInBytes"])
        )
    else:
        raise ValueError(f"unknown DV storageType {st!r}")
    card = descriptor.get("cardinality")
    if card is not None and int(card) != len(vals):
        raise ValueError(
            f"DV cardinality mismatch: descriptor says {card}, "
            f"bitmap holds {len(vals)}"
        )
    return sorted(vals)


# ---------------------------------------------------------------------------
# write side (this module's writer emits DVs for merge-on-read deletes)
# ---------------------------------------------------------------------------


def _serialize_roaring32(values: list[int]) -> bytes:
    """One 32-bit roaring bitmap, portable no-run serialization. Array
    containers ≤4096 values, bitset containers above — the canonical
    encoder choice; run containers are a read-side-only concern here."""
    by_key: dict[int, list[int]] = {}
    for v in values:
        by_key.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(by_key)
    out = struct.pack("<i", _SERIAL_COOKIE_NO_RUN) + struct.pack("<i", len(keys))
    for k in keys:
        out += struct.pack("<HH", k, len(by_key[k]) - 1)
    pos = 8 + 8 * len(keys)
    offsets = b""
    datas = b""
    for k in keys:
        offsets += struct.pack("<I", pos)
        lows = sorted(by_key[k])
        if len(lows) <= 4096:
            chunk = struct.pack(f"<{len(lows)}H", *lows)
        else:
            words = [0] * 1024
            for lo in lows:
                words[lo >> 6] |= 1 << (lo & 63)
            chunk = struct.pack("<1024Q", *words)
        datas += chunk
        pos += len(chunk)
    return out + offsets + datas


def serialize_dv_blob(positions: list[int]) -> bytes:
    """Sorted row positions → DV blob (magic + RoaringBitmapArray) —
    the exact inverse of :func:`parse_dv_blob` (property-tested)."""
    buckets: dict[int, list[int]] = {}
    for v in positions:
        if v < 0:
            raise ValueError(f"negative row position {v}")
        buckets.setdefault(v >> 32, []).append(v & 0xFFFFFFFF)
    n = (max(buckets) + 1) if buckets else 0
    out = struct.pack("<i", DV_MAGIC) + struct.pack("<q", n)
    for i in range(n):
        out += _serialize_roaring32(buckets.get(i, []))
    return out


#: inline-vs-file threshold: small DVs ride the log line itself, large
#: ones go to a .bin sidecar (the log stays metadata-sized either way)
_INLINE_DV_MAX = 1024


def make_dv_descriptor(table_path: str, positions: list[int]) -> dict:
    """Build a deletionVector descriptor for ``positions`` — inline Z85
    under ``_INLINE_DV_MAX`` bytes, else a ``deletion_vector_<uuid>.bin``
    file in the table root (format version byte + BE size frame +
    CRC-32 trailer, exactly what :func:`read_dv_from_file` verifies)."""
    import os
    import uuid as _uuid

    positions = sorted(set(int(p) for p in positions))
    blob = serialize_dv_blob(positions)
    if len(blob) <= _INLINE_DV_MAX:
        padded = blob + b"\x00" * (-len(blob) % 4)
        return {
            "storageType": "i",
            "pathOrInlineDv": z85_encode(padded),
            "sizeInBytes": len(blob),
            "cardinality": len(positions),
        }
    u = _uuid.uuid4()
    rel = f"deletion_vector_{u}.bin"
    with open(os.path.join(table_path, rel), "wb") as fh:
        fh.write(b"\x01")
        offset = fh.tell()
        fh.write(struct.pack(">i", len(blob)))
        fh.write(blob)
        fh.write(struct.pack(">I", zlib.crc32(blob) & 0xFFFFFFFF))
    return {
        "storageType": "u",
        "pathOrInlineDv": z85_encode(u.bytes),
        "offset": offset,
        "sizeInBytes": len(blob),
        "cardinality": len(positions),
    }
