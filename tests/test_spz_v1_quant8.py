"""v1 legacy whole-matrix codec + v2 quant8 value type.

Closes the codec compat matrix: the reference reads/writes .spz v1
(streampress/sparsepress.hpp:38-640, format/header.hpp) and v2 quant8
chunks (sparsepress_v2.hpp:351-390, header_v2.hpp:53).  Encode-side byte
layout is pinned structurally against the published v1 spec (72-byte
header field order, section order model|col_counts|struct_k|struct|values,
CRC32 over the payload) so a writer regression cannot hide behind a
matching in-repo decoder.
"""

import struct
import zlib

import numpy as np
import pytest

scipy_sparse = pytest.importorskip("scipy.sparse")

from rcppml_tpu.io.spz import (compress_to_spz_bytes, compress_to_spz_v1_bytes,
                               decompress_spz_bytes, spz_info_bytes,
                               spz_version_bytes, st_read_auto)

V1_HEADER_FMT = "<4sHHIIQIBHHBQIIIIII"   # 72 bytes (format/header.hpp:28-46)


def _parse_v1_header(buf):
    f = struct.unpack_from(V1_HEADER_FMT, buf, 0)
    return dict(magic=f[0], version=f[1], flags=f[2], m=f[3], n=f[4],
                nnz=f[5], max_value=f[6], value_type=f[7],
                rice_block_size=f[8], density_blocks=f[9], reserved1=f[10],
                prng_seed=f[11], model_size=f[12], struct_size=f[13],
                values_size=f[14], col_counts_size=f[15],
                struct_k_size=f[16], crc32=f[17])


def _int_matrix(m=180, n=120, density=0.07, seed=3, scale=30):
    rs = np.random.RandomState(seed)
    A = scipy_sparse.random(m, n, density=density, random_state=rs,
                            format="csc")
    A.data[:] = np.ceil(A.data * scale)
    A.eliminate_zeros()
    A.sort_indices()
    return A.astype(np.float32)


# ---------------------------------------------------------------------------
# v1 round-trips
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("use_delta,use_vpred", [(True, True), (True, False),
                                                 (False, True), (False, False)])
def test_v1_integer_roundtrip(use_delta, use_vpred):
    A = _int_matrix()
    buf = compress_to_spz_v1_bytes(A, use_delta=use_delta,
                                   use_vpred=use_vpred)
    B = decompress_spz_bytes(buf)
    assert B.shape == A.shape
    assert (B != A).nnz == 0


def test_v1_float_roundtrip():
    # non-integer values take the f64 XOR-delta byte-shuffle path
    # (sparsepress.hpp:262-346)
    rs = np.random.RandomState(11)
    A = scipy_sparse.random(90, 70, density=0.1, random_state=rs,
                            format="csc").astype(np.float32)
    buf = compress_to_spz_v1_bytes(A)
    B = decompress_spz_bytes(buf)
    np.testing.assert_allclose(B.toarray(), A.toarray(), rtol=0, atol=0)


def test_v1_value_type_widths():
    # u8 / u16 / u32 selection by max value (transform/value_map.hpp)
    for scale, vt in [(200, "uint8"), (40_000, "uint16"), (80_000, "uint32")]:
        A = _int_matrix(m=60, n=40, density=0.15, seed=5, scale=scale)
        buf = compress_to_spz_v1_bytes(A)
        info = spz_info_bytes(buf)
        assert info["version"] == 1
        assert info["value_type"] == vt
        assert (decompress_spz_bytes(buf) != A).nnz == 0


def test_v1_empty_and_degenerate():
    Z = scipy_sparse.csc_matrix((10, 8), dtype=np.float32)
    buf = compress_to_spz_v1_bytes(Z)
    B = decompress_spz_bytes(buf)
    assert B.nnz == 0 and B.shape == (10, 8)
    # single entry
    S = scipy_sparse.csc_matrix(([3.0], ([4], [2])), shape=(9, 6),
                                dtype=np.float32)
    buf = compress_to_spz_v1_bytes(S)
    assert (decompress_spz_bytes(buf) != S).nnz == 0


def test_v1_header_layout_pinned():
    A = _int_matrix(seed=9)
    buf = compress_to_spz_v1_bytes(A)
    h = _parse_v1_header(buf)
    assert h["magic"] == b"SPRZ"
    assert h["version"] == 1
    assert h["m"] == A.shape[0] and h["n"] == A.shape[1]
    assert h["nnz"] == A.nnz
    assert h["max_value"] == int(A.data.max())
    # FLAG_DELTA_PREDICTION | FLAG_VALUE_PREDICTION | FLAG_INTEGER_VALUES
    assert h["flags"] == 0x7
    # section sizes tile the buffer exactly
    total = 72 + h["model_size"] + h["col_counts_size"] + \
        h["struct_k_size"] + h["struct_size"] + h["values_size"]
    assert total == len(buf)
    # CRC32 (zlib polynomial) over everything after the header
    assert h["crc32"] == zlib.crc32(buf[72:]) & 0xFFFFFFFF


def test_v1_detects_corruption():
    A = _int_matrix(seed=13)
    buf = bytearray(compress_to_spz_v1_bytes(A))
    buf[100] ^= 0xFF
    with pytest.raises(ValueError, match="CRC32"):
        decompress_spz_bytes(bytes(buf))
    # truncation
    with pytest.raises(ValueError):
        decompress_spz_bytes(bytes(buf[:50]))


def test_v1_no_transpose_stream():
    A = _int_matrix(seed=17)
    buf = compress_to_spz_v1_bytes(A)
    info = spz_info_bytes(buf)
    assert not info["has_transpose"]
    with pytest.raises(ValueError, match="transpose"):
        decompress_spz_bytes(buf, transpose=True)


def test_st_read_auto_handles_v1(tmp_path):
    A = _int_matrix(seed=21)
    p = tmp_path / "legacy.spz"
    p.write_bytes(compress_to_spz_v1_bytes(A))
    B = st_read_auto(str(p))
    assert (B != A).nnz == 0
    assert spz_version_bytes(p.read_bytes()) == 1


# ---------------------------------------------------------------------------
# v2 quant8 value type
# ---------------------------------------------------------------------------

def test_quant8_roundtrip_within_step():
    rs = np.random.RandomState(2)
    A = scipy_sparse.random(150, 110, density=0.09, random_state=rs,
                            format="csc").astype(np.float32)
    buf = compress_to_spz_bytes(A, value_type="quant8")
    info = spz_info_bytes(buf)
    assert info["value_type"] == "quant8"
    B = decompress_spz_bytes(buf)
    assert (B.indptr == A.indptr).all() and (B.indices == A.indices).all()
    # per-chunk affine uint8: error bounded by half a quantization step
    step = (A.data.max() - A.data.min()) / 255.0
    assert np.abs(B.data - A.data).max() <= step * 0.5 + 1e-6


def test_quant8_transpose_stream():
    rs = np.random.RandomState(4)
    A = scipy_sparse.random(80, 60, density=0.12, random_state=rs,
                            format="csc").astype(np.float32)
    buf = compress_to_spz_bytes(A, value_type="quant8", with_transpose=True)
    Bt = decompress_spz_bytes(buf, transpose=True)
    B = decompress_spz_bytes(buf)
    np.testing.assert_allclose(Bt.toarray(), B.toarray().T, rtol=0,
                               atol=1e-6)


def test_quant8_constant_values():
    # vmax == vmin -> scale falls back to 1.0 (sparsepress_v2.hpp:366)
    A = scipy_sparse.random(40, 30, density=0.2, random_state=1,
                            format="csc").astype(np.float32)
    A.data[:] = 2.5
    buf = compress_to_spz_bytes(A, value_type="quant8")
    B = decompress_spz_bytes(buf)
    np.testing.assert_allclose(B.data, 2.5, rtol=0, atol=1e-6)


def test_quant8_chunked_quantization_is_per_chunk():
    # two chunks with disjoint ranges: per-chunk params keep the error
    # bounded by each CHUNK's range, not the global one
    rs = np.random.RandomState(6)
    left = scipy_sparse.random(100, 64, density=0.2, random_state=rs,
                               format="csc").astype(np.float32)
    right = scipy_sparse.random(100, 64, density=0.2, random_state=rs,
                                format="csc").astype(np.float32)
    right.data = right.data * 1000.0 + 5000.0
    A = scipy_sparse.hstack([left, right], format="csc")
    buf = compress_to_spz_bytes(A, value_type="quant8", chunk_cols=64,
                                with_transpose=False)
    B = decompress_spz_bytes(buf).toarray()
    Ad = A.toarray()
    lstep = (left.data.max() - left.data.min()) / 255.0
    assert np.abs(B[:, :64] - Ad[:, :64]).max() <= lstep * 0.5 + 1e-6


# ---------------------------------------------------------------------------
# round-4 review regressions: header/stream trust boundaries
# ---------------------------------------------------------------------------

def test_v1_rejects_nnz_above_u32():
    # the v1 CRC covers the payload only, so the header nnz is attacker-
    # controlled; a value > 2^32-1 used to truncate the symbol-vector
    # size to (u32)nnz while the column pointers still indexed the full
    # range -> OOB heap reads (streampress.cpp HeaderV1::parse guard)
    A = _int_matrix(seed=21)
    buf = bytearray(compress_to_spz_v1_bytes(A))
    struct.pack_into("<Q", buf, 16, 1 << 32)          # nnz field
    with pytest.raises(ValueError, match="nnz"):
        decompress_spz_bytes(bytes(buf))
    # also implausible nnz > m*n (but < 2^32)
    struct.pack_into("<Q", buf, 16, A.shape[0] * A.shape[1] + 1)
    with pytest.raises(ValueError, match="nnz"):
        decompress_spz_bytes(bytes(buf))


def test_v1_truncated_overflow_section_is_an_error():
    # escape streams (non-quant8) REQUIRE the overflow section; a stream
    # that ends right after [encoded] must raise, not silently leave
    # escaped entries as literal 255 (round-4 review: the quant8
    # optional-overflow compat must not relax other streams)
    A = _int_matrix(seed=23, scale=1)
    A.data[0] = 300.0                                  # exactly one escape
    buf = bytearray(compress_to_spz_v1_bytes(A, use_delta=False,
                                             use_vpred=False))
    h = _parse_v1_header(buf)
    # the value stream is the last section; one escape value 300 ->
    # overflow = [ov_sz=2 u32][varint(300) = 2 bytes] = 6-byte tail
    assert bytes(buf[-6:-2]) == b"\x02\x00\x00\x00"
    del buf[-6:]
    struct.pack_into("<I", buf, 50, h["values_size"] - 6)   # values_size
    struct.pack_into("<I", buf, 62,
                     zlib.crc32(bytes(buf[72:])) & 0xFFFFFFFF)
    with pytest.raises(ValueError):
        decompress_spz_bytes(bytes(buf))


def test_duplicate_entries_are_canonicalized_not_miscoded():
    # scipy allows duplicate (row, col) entries; gap coding would wrap
    # the u32 gap and write a CRC-valid file that misdecodes.  The
    # Python layer canonicalizes (summing duplicates, like scipy's own
    # semantics); the native encoders refuse non-canonical input.
    import ctypes
    from rcppml_tpu.io.spz import (_load_lib, compress_to_spz_bytes,
                                   decompress_spz_bytes)
    indptr = np.array([0, 3, 4], dtype=np.int64)
    indices = np.array([1, 1, 4, 0], dtype=np.int32)   # dup row 1 in col 0
    data = np.array([2.0, 3.0, 1.0, 5.0], dtype=np.float32)
    A = scipy_sparse.csc_matrix((data, indices, indptr), shape=(6, 2))
    for enc in (compress_to_spz_v1_bytes, compress_to_spz_bytes):
        buf = enc(A)
        B = decompress_spz_bytes(buf)
        np.testing.assert_allclose(B.toarray(), A.toarray())  # summed dups
    # the original matrix is not mutated by encoding
    assert A.indptr[1] == 3 and A.data[0] == 2.0
    # the native encoder itself refuses raw non-canonical arrays
    lib = _load_lib()
    pp = indptr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
    ip = indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    xp = data.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    rc = lib.spz_encode_v1(6, 2, pp, ip, xp, 1, 1, None, 0)
    assert rc < 0 and b"duplicate" in lib.spz_last_error()
