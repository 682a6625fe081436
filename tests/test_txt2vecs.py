"""txt2vecs converter: reference line formats -> repo binary datasets.

Oracle: hand-built text files in the reference's formats
(`tools/core/txt_input_reader.h:138-305`) must round-trip through the CLI
into arrays identical to the literal numbers."""

import numpy as np
import pytest

from zvec_tpu.tools.io import read_vecs
from zvec_tpu.tools.txt2vecs import (
    convert_sparse,
    main,
    sparse_rows,
)


def test_dense_roundtrip(tmp_path):
    txt = tmp_path / "in.txt"
    txt.write_text("0;1 2 3 4\n1;5 6 7 8\n\n7;9 10 11 12\n")
    out = str(tmp_path / "out.fvecs")
    assert main(["--input", str(txt), "--output", out, "--dimension", "4"]) == 0
    got = read_vecs(out)
    np.testing.assert_array_equal(
        got, np.array([[1, 2, 3, 4], [5, 6, 7, 8], [9, 10, 11, 12]], np.float32)
    )
    # non-identity keys (0, 1, 7) emit a sidecar
    keys = np.load(out + ".keys.npy")
    np.testing.assert_array_equal(keys, np.array([0, 1, 7], np.uint64))


def test_dense_int8_and_dim_mismatch(tmp_path, capsys):
    txt = tmp_path / "in.txt"
    txt.write_text("0;1 2 3\n1;4 5\n2;6 7 8\n")  # middle row: wrong dim, skipped
    out = str(tmp_path / "out.bvecs")
    main(["--input", str(txt), "--output", out, "--dimension", "3",
          "--type", "int8"])
    got = read_vecs(out)
    assert got.shape == (2, 3)
    np.testing.assert_array_equal(got[1], np.array([6, 7, 8], np.uint8))


def test_sparse_roundtrip(tmp_path):
    txt = tmp_path / "in.txt"
    txt.write_text("3;2;1 5:0.5 0.25\n9;3;0 2 7:1 2 3\n")
    out = str(tmp_path / "out.npz")
    assert main(["--input", str(txt), "--output", out,
                 "--vector-type", "sparse"]) == 0
    keys, rows = sparse_rows(out)
    np.testing.assert_array_equal(keys, np.array([3, 9], np.uint64))
    assert rows[0] == {1: 0.5, 5: 0.25}
    assert rows[1] == {0: 1.0, 2: 2.0, 7: 3.0}


def test_sparse_validation(tmp_path):
    bad_len = tmp_path / "a.txt"
    bad_len.write_text("1;2;1 5:0.5\n")  # 2 indices, 1 value
    with pytest.raises(ValueError, match="count"):
        convert_sparse(str(bad_len))
    bad_order = tmp_path / "b.txt"
    bad_order.write_text("1;2;5 1:0.5 0.25\n")  # indices not ascending
    with pytest.raises(ValueError, match="ordered"):
        convert_sparse(str(bad_order))
