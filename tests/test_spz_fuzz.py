"""Corpus fuzz of the native .spz decoder (VERDICT r3 item 7).

The decoder consumes UNTRUSTED bytes (files from disk, possibly written by
other tools or corrupted in transit).  Contract under corruption:
every entry point raises ValueError (the C side catches and reports via
spz_last_error) — it must never crash, hang, or scribble outside the
caller-allocated output arrays.  The corpus applies seeded random byte
flips, truncations, extensions, and targeted header-field mutations
(huge declared sizes, offset overflow — the >4GiB u32 guard) across
v1, v2 (all value types + transpose), and v3 streams.

Memory-safety note: flips can also produce buffers that DECODE cleanly
to different (but in-bounds) payloads — that is fine; out-of-bounds
writes would surface as crashes/ASAN-style corruption under the sized
numpy output arrays allocated from the (possibly lying) header, which
spz_info validates first.
"""

import struct

import numpy as np
import pytest

scipy_sparse = pytest.importorskip("scipy.sparse")

from rcppml_tpu.io.spz import (compress_dense_to_spz_bytes,
                               compress_to_spz_bytes,
                               compress_to_spz_v1_bytes,
                               decompress_dense_spz_bytes,
                               decompress_spz_bytes, spz_info_bytes,
                               spz_version_bytes)


def _matrix(seed=0, m=120, n=90, density=0.08, integer=True):
    rs = np.random.RandomState(seed)
    A = scipy_sparse.random(m, n, density=density, random_state=rs,
                            format="csc")
    if integer:
        A.data[:] = np.ceil(A.data * 50)
    A.eliminate_zeros()
    return A.astype(np.float32)


def _decode_any(data: bytes):
    """Route like st_read_auto but on bytes; success or ValueError only."""
    ver = spz_version_bytes(data)
    if ver == 3:
        return decompress_dense_spz_bytes(data)
    # v1/v2/garbage all go through the sparse entry (it re-validates)
    return decompress_spz_bytes(data)


def _expect_no_crash(data: bytes):
    try:
        _decode_any(data)
    except (ValueError, OverflowError, MemoryError):
        pass  # rejected cleanly — the contract


def _corpus():
    out = []
    A = _matrix(seed=1)
    out.append(("v2_u8", compress_to_spz_bytes(A, value_type="uint8")))
    out.append(("v2_f32", compress_to_spz_bytes(
        _matrix(seed=2, integer=False), value_type="float32")))
    out.append(("v2_q8", compress_to_spz_bytes(
        _matrix(seed=3, integer=False), value_type="quant8")))
    out.append(("v2_f16_not", compress_to_spz_bytes(
        _matrix(seed=4, integer=False), value_type="float16",
        with_transpose=False)))
    out.append(("v1_int", compress_to_spz_v1_bytes(_matrix(seed=5))))
    out.append(("v1_f64", compress_to_spz_v1_bytes(
        _matrix(seed=6, integer=False))))
    out.append(("v3_raw", compress_dense_to_spz_bytes(
        np.random.RandomState(7).rand(40, 30).astype(np.float32))))
    out.append(("v3_fp16", compress_dense_to_spz_bytes(
        np.random.RandomState(8).rand(40, 30).astype(np.float32),
        codec="fp16")))
    return out


CORPUS = _corpus()


@pytest.mark.parametrize("name,base", CORPUS, ids=[c[0] for c in CORPUS])
def test_random_byte_flips(name, base):
    """200 seeded single/multi-byte flips per stream: never crash."""
    rs = np.random.RandomState(hash(name) % (2 ** 31))
    arr = np.frombuffer(base, dtype=np.uint8)
    for trial in range(200):
        buf = arr.copy()
        nflips = 1 + (trial % 4)
        idx = rs.randint(0, len(buf), size=nflips)
        buf[idx] ^= rs.randint(1, 256, size=nflips).astype(np.uint8)
        _expect_no_crash(buf.tobytes())


@pytest.mark.parametrize("name,base", CORPUS, ids=[c[0] for c in CORPUS])
def test_truncations(name, base):
    """Every prefix length from a seeded sample + all short prefixes."""
    rs = np.random.RandomState(1 + hash(name) % (2 ** 31))
    for cut in range(0, min(len(base), 144)):
        _expect_no_crash(base[:cut])
    for _ in range(60):
        cut = int(rs.randint(0, len(base)))
        _expect_no_crash(base[:cut])


@pytest.mark.parametrize("name,base", CORPUS, ids=[c[0] for c in CORPUS])
def test_extensions_and_splices(name, base):
    """Trailing garbage and cross-spliced streams."""
    rs = np.random.RandomState(2)
    _expect_no_crash(base + b"\xde\xad\xbe\xef" * 8)
    other = CORPUS[(CORPUS.index((name, base)) + 1) % len(CORPUS)][1]
    mid = len(base) // 2
    _expect_no_crash(base[:mid] + other[mid:])
    # random block swap inside the stream
    if len(base) > 64:
        a, b = sorted(rs.randint(8, len(base) - 8, size=2))
        buf = bytearray(base)
        buf[a:a + 8], buf[b:b + 8] = buf[b:b + 8], buf[a:a + 8]
        _expect_no_crash(bytes(buf))


def test_huge_declared_sizes_v2():
    """Targeted header lies: nnz/num_chunks/offsets near u32/u64 limits
    must be rejected before any allocation-proportional work."""
    base = bytearray(compress_to_spz_bytes(_matrix(seed=9)))
    # header_v2 layout: nnz u64 @16, chunk_cols u32 @24, num_chunks u32 @28
    # offsets u64 @48(chunk_index) 56(tables) 64(data) 72(transpose)
    for off, fmt, val in [
        (16, "<Q", 2 ** 63 - 1),        # nnz
        (28, "<I", 2 ** 32 - 1),        # num_chunks
        (48, "<Q", 2 ** 64 - 9),        # chunk_index_offset
        (64, "<Q", 2 ** 64 - 9),        # data_offset
        (72, "<Q", len(base) - 2),      # transpose_offset just in range
        (72, "<Q", 2 ** 64 - 9),        # transpose_offset overflow
    ]:
        buf = bytearray(base)
        struct.pack_into(fmt, buf, off, val)
        _expect_no_crash(bytes(buf))
        # info must also reject or return without touching payload
        try:
            spz_info_bytes(bytes(buf))
        except ValueError:
            pass


def test_huge_declared_sizes_v1():
    """v1 header lies: section sizes that overflow the buffer, nnz larger
    than the column counts support, zero-density models."""
    base = bytearray(compress_to_spz_v1_bytes(_matrix(seed=10)))
    # v1 layout (format/header.hpp; pinned by test_spz_v1_quant8.py
    # V1_HEADER_FMT): nnz u64 @16, model_size u32 @42, struct_size @46,
    # values_size @50, col_counts_size @54, struct_k_size @58, crc @62.
    # (round-4 review: the original offsets 12/40/... landed in n and
    # the prng seed, so these guards were never actually exercised)
    for off, fmt, val in [
        (16, "<Q", 2 ** 63 - 1),
        (42, "<I", 2 ** 32 - 1),
        (46, "<I", 2 ** 32 - 1),
        (50, "<I", 2 ** 32 - 1),
        (54, "<I", 2 ** 32 - 1),
        (58, "<I", 2 ** 32 - 1),
    ]:
        buf = bytearray(base)
        struct.pack_into(fmt, buf, off, val)
        _expect_no_crash(bytes(buf))


def test_chunk_descriptor_lies_v2():
    """Mutate every field of the first chunk descriptor to extremes."""
    base = compress_to_spz_bytes(_matrix(seed=11), with_transpose=False)
    h_chunk_index = struct.unpack_from("<Q", base, 48)[0]
    for field_off in range(0, 48, 4):
        for val in (0, 2 ** 31, 2 ** 32 - 1):
            buf = bytearray(base)
            struct.pack_into("<I", buf, h_chunk_index + field_off, val)
            _expect_no_crash(bytes(buf))


def test_all_zero_and_random_garbage():
    _expect_no_crash(b"")
    _expect_no_crash(b"\x00" * 200)
    _expect_no_crash(b"SPRZ" + b"\x00" * 196)
    rs = np.random.RandomState(12)
    for _ in range(50):
        n = int(rs.randint(0, 4096))
        _expect_no_crash(rs.randint(0, 256, size=n).astype(np.uint8)
                         .tobytes())
    # valid magic + every version number
    for ver in range(0, 9):
        _expect_no_crash(b"SPRZ" + struct.pack("<H", ver) + b"\x00" * 300)


def test_no_silent_misdecode_under_byte_flips():
    """r5: the footer CRC is now VERIFIED on read (the reference writes it
    but never checks — 25% of payload flips silently misdecoded).  Any
    flipped byte must either decode to the exact original (flip in the
    8 unused footer metadata bytes) or raise ValueError."""
    import numpy as np
    import scipy.sparse as sp
    from rcppml_tpu.io import spz
    rs = np.random.RandomState(0)
    A = sp.random(80, 60, density=0.15, random_state=rs, format="csc",
                  dtype=np.float32)
    A.data[:] = np.round(A.data * 50)
    base = spz.compress_to_spz_bytes(A, with_transpose=True)
    ref = spz.decompress_spz_bytes(base)
    arr = np.frombuffer(base, np.uint8).copy()
    positions = rs.choice(len(arr), 300, replace=False)
    for pos in positions:
        m = arr.copy()
        m[pos] ^= 0xFF
        try:
            out = spz.decompress_spz_bytes(m.tobytes())
        except ValueError:
            continue
        assert (out != ref).nnz == 0 and np.array_equal(
            out.indptr, ref.indptr), f"silent misdecode at byte {pos}"


def test_spz_loader_rejects_corrupt_file(tmp_path):
    import numpy as np
    import scipy.sparse as sp
    import pytest as _pt
    from rcppml_tpu.io import spz
    from rcppml_tpu.io.loaders import SpzLoader
    rs = np.random.RandomState(1)
    A = sp.random(60, 50, density=0.2, random_state=rs, format="csc",
                  dtype=np.float32)
    b = bytearray(spz.compress_to_spz_bytes(A, with_transpose=True))
    b[len(b) // 3] ^= 0x55
    with _pt.raises(ValueError, match="CRC32|corrupt"):
        SpzLoader(bytes(b))
