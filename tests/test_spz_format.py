"""Encoder-side byte-level format pinning for .spz (v2 + v3).

The decode direction is proven against reference-encoded bytes (pbmc3k,
tests/test_spz.py::test_reference_pbmc3k_decodes).  These tests pin the
ENCODE direction structurally against the published v2 spec
(streampress/format/header_v2.hpp:118-283) so writer regressions cannot
hide behind a matching in-repo decoder: every header field, the chunk
descriptor table, stream extents, the footer (incl. the zlib-polynomial
file CRC32, checksum.hpp:17-70), and metadata/obs-var section layout are
asserted byte-for-byte on fixed matrices, plus encode-property fuzz
across value types.
"""

import struct
import zlib

import numpy as np
import pytest

scipy_sparse = pytest.importorskip("scipy.sparse")

from rcppml_tpu.io.spz import (compress_to_spz_bytes, decompress_spz_bytes,
                               st_write_with_metadata)

HEADER_FMT = "<4sHHIIQIIIIBBBBIQQQQQIf32s"   # 128 bytes (header_v2.hpp:118)
CHUNK_FMT = "<IIIIIIIIIffI"                  # 48 bytes (header_v2.hpp:220)
FOOTER_FMT = "<III4s"                        # 16 bytes (header_v2.hpp:251)

VT_CODE = {"uint8": 0, "uint16": 1, "uint32": 2, "float32": 3,
           "float16": 4, "quant8": 5, "float64": 6}
VT_BYTES = {0: 1, 1: 2, 2: 4, 3: 4, 4: 2, 5: 1, 6: 8}


def _fixed_matrix(m=97, n=53, density=0.11, seed=7, integer=True):
    rs = np.random.RandomState(seed)
    A = scipy_sparse.random(m, n, density=density, random_state=rs,
                            format="csc")
    if integer:
        A.data[:] = np.ceil(A.data * 40)
    A.eliminate_zeros()
    return A


def _parse_header(buf):
    f = struct.unpack_from(HEADER_FMT, buf, 0)
    return dict(magic=f[0], version=f[1], header_size=f[2], m=f[3], n=f[4],
                nnz=f[5], chunk_cols=f[6], num_chunks=f[7], num_tables=f[8],
                table_log=f[9], value_type=f[10], compression_level=f[11],
                row_sorted=f[12], col_sorted=f[13], most_common_value=f[14],
                chunk_index_offset=f[15], tables_offset=f[16],
                data_offset=f[17], transpose_offset=f[18],
                metadata_offset=f[19], max_value=f[20], density=f[21],
                reserved=f[22])


def _parse_chunks(buf, h):
    out = []
    for c in range(h["num_chunks"]):
        f = struct.unpack_from(CHUNK_FMT, buf,
                               h["chunk_index_offset"] + 48 * c)
        out.append(dict(col_start=f[0], num_cols=f[1], nnz=f[2],
                        stream_offset=(f[3], f[4]), stream_size=(f[5], f[6]),
                        decoded_gap_bytes=f[7], decoded_value_bytes=f[8],
                        quant_scale=f[9], quant_offset=f[10], reserved=f[11]))
    return out


def _parse_footer(buf):
    meta_size, crc, total_chunks, magic = struct.unpack_from(
        FOOTER_FMT, buf, len(buf) - 16)
    return dict(metadata_size=meta_size, file_crc32=crc,
                total_chunks=total_chunks, magic=magic)


def test_header_fields_pinned():
    A = _fixed_matrix()
    chunk_cols = 32
    buf = compress_to_spz_bytes(A, chunk_cols=chunk_cols,
                                with_transpose=False)
    h = _parse_header(buf)
    assert h["magic"] == b"SPRZ"
    assert h["version"] == 2
    assert h["header_size"] == 128
    assert (h["m"], h["n"]) == A.shape
    assert h["nnz"] == A.nnz
    assert h["chunk_cols"] == chunk_cols
    assert h["num_chunks"] == -(-A.shape[1] // chunk_cols)
    # tables embedded per chunk: empty table section, exactly the layout
    # the reference writer emits (sparsepress_v2.hpp:630,643-644)
    assert h["num_tables"] == 0
    assert h["chunk_index_offset"] == 128
    assert h["tables_offset"] == 128 + 48 * h["num_chunks"]
    assert h["data_offset"] == h["tables_offset"]
    assert h["value_type"] == VT_CODE["uint8"]   # ceil(x*40) fits uint8
    assert h["density"] == pytest.approx(A.nnz / (A.shape[0] * A.shape[1]),
                                         rel=1e-6)
    assert h["transpose_offset"] == 0
    assert h["metadata_offset"] == 0


def test_chunk_descriptor_table_pinned():
    A = _fixed_matrix(m=211, n=77)
    chunk_cols = 25                       # non-divisible tail chunk
    buf = compress_to_spz_bytes(A, chunk_cols=chunk_cols,
                                with_transpose=False)
    h = _parse_header(buf)
    chunks = _parse_chunks(buf, h)
    assert len(chunks) == -(-77 // chunk_cols)
    vb = VT_BYTES[h["value_type"]]
    data_end = len(buf) - 16
    pos_total = 0
    for ci, c in enumerate(chunks):
        assert c["col_start"] == ci * chunk_cols
        assert c["num_cols"] == min(chunk_cols, 77 - ci * chunk_cols)
        col_lo, col_hi = c["col_start"], c["col_start"] + c["num_cols"]
        assert c["nnz"] == int(A.indptr[col_hi] - A.indptr[col_lo])
        assert c["decoded_value_bytes"] == c["nnz"] * vb
        assert c["reserved"] == 0
        for s in range(2):
            off, size = c["stream_offset"][s], c["stream_size"][s]
            assert h["data_offset"] + off + size <= data_end
        pos_total += c["nnz"]
    assert pos_total == A.nnz


def test_footer_pinned_and_crc():
    A = _fixed_matrix()
    buf = compress_to_spz_bytes(A, chunk_cols=32)     # with transpose
    f = _parse_footer(buf)
    h = _parse_header(buf)
    assert h["transpose_offset"] > h["data_offset"]   # transpose section
    del h
    h = _parse_header(buf)
    assert f["magic"] == b"SPEN"
    assert f["total_chunks"] == h["num_chunks"]
    assert f["metadata_size"] == 0
    # file_crc32 covers everything before the footer, zlib polynomial
    # (checksum.hpp:57-70; zlib.crc32 implements the same reflected
    # 0xEDB88320 CRC so this is an independent cross-check)
    assert f["file_crc32"] == zlib.crc32(buf[:-16]) & 0xFFFFFFFF


def test_metadata_section_layout(tmp_path):
    A = _fixed_matrix(m=40, n=30)
    rn = [f"g{i}" for i in range(40)]
    cn = [f"c{j}" for j in range(30)]
    obs = {"ct": np.array(["a", "b", "c"] * 10)}
    p = str(tmp_path / "meta.spz")
    st_write_with_metadata(A, p, obs=obs, rownames=rn, colnames=cn)
    buf = open(p, "rb").read()
    h = _parse_header(buf)
    f = _parse_footer(buf)
    # reserved-byte extension fields (header_v2.hpp:173-186)
    obs_off, var_off = struct.unpack("<QQ", h["reserved"][:16])
    ext_flags = h["reserved"][20]
    assert obs_off > 0 and var_off == 0
    assert ext_flags & 0x01                       # has_dimnames
    assert h["metadata_offset"] > obs_off
    assert f["metadata_size"] == len(buf) - 16 - h["metadata_offset"]
    assert f["file_crc32"] == zlib.crc32(buf[:-16]) & 0xFFFFFFFF
    # dimnames metadata entries: [key u8][size u32][payload] null-joined
    pos = h["metadata_offset"]
    n_entries, = struct.unpack_from("<I", buf, pos)
    pos += 4
    seen = {}
    for _ in range(n_entries):
        key, size = struct.unpack_from("<BI", buf, pos)
        pos += 5
        seen[key] = buf[pos:pos + size]
        pos += size
    assert 0 in seen and 1 in seen                 # ROWNAMES, COLNAMES
    assert seen[0].split(b"\x00")[:-1] == [s.encode() for s in rn]
    assert seen[1].split(b"\x00")[:-1] == [s.encode() for s in cn]


def test_v3_footer_crc(tmp_path):
    A = np.abs(np.random.RandomState(3).randn(33, 21)).astype(np.float32)
    from rcppml_tpu.io.spz import st_write_dense
    p = str(tmp_path / "d.spz")
    st_write_dense(A, p)
    buf = open(p, "rb").read()
    assert buf[:4] == b"SPRZ"
    version = struct.unpack_from("<H", buf, 4)[0]
    assert version == 3
    f = _parse_footer(buf)
    assert f["magic"] == b"SPEN"
    assert f["file_crc32"] == zlib.crc32(buf[:-16]) & 0xFFFFFFFF


@pytest.mark.parametrize("vt,gen", [
    ("uint8", lambda rs, nnz: rs.randint(1, 250, nnz).astype(np.float64)),
    ("uint16", lambda rs, nnz: rs.randint(1, 60000, nnz).astype(np.float64)),
    # uint32 values capped at 2^24 so the fp32 decode boundary is exact
    ("uint32", lambda rs, nnz: rs.randint(65536, 2**24, nnz)
     .astype(np.float64)),
    ("float32", lambda rs, nnz: rs.randn(nnz)),
    ("float64", lambda rs, nnz: rs.randn(nnz)),
])
def test_encode_property_fuzz(vt, gen):
    """Random matrices: structural invariants + exact decode identity."""
    for seed in range(4):
        rs = np.random.RandomState(seed)
        m, n = rs.randint(5, 300), rs.randint(5, 200)
        A = scipy_sparse.random(m, n, density=float(rs.uniform(0.01, 0.3)),
                                random_state=rs, format="csc")
        if A.nnz == 0:
            A[0, 0] = 1.0
            A = A.tocsc()
        A.data[:] = gen(rs, A.nnz)
        A.eliminate_zeros()
        cc = int(rs.choice([7, 32, 256]))
        buf = compress_to_spz_bytes(A, chunk_cols=cc, with_transpose=False)
        h = _parse_header(buf)
        f = _parse_footer(buf)
        assert (h["m"], h["n"], h["nnz"]) == (m, n, A.nnz)
        assert f["total_chunks"] == h["num_chunks"]
        assert f["file_crc32"] == zlib.crc32(buf[:-16]) & 0xFFFFFFFF
        chunks = _parse_chunks(buf, h)
        assert sum(c["nnz"] for c in chunks) == A.nnz
        assert sum(c["num_cols"] for c in chunks) == n
        B = decompress_spz_bytes(buf)
        expect = A.toarray()
        got = np.asarray(B.todense())
        if vt == "float32":
            np.testing.assert_allclose(got, expect.astype(np.float32),
                                       rtol=0, atol=0)
        else:
            np.testing.assert_array_equal(got, expect.astype(np.float32))
