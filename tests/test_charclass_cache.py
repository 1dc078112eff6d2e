"""The on-disk charclass table cache must actually round-trip.

Regression test for a bug where ``np.save`` appended ``.npy`` to the tmp
file name, making the final ``os.replace`` fail silently — every process
rebuilt the 1.1M-codepoint table and littered the package dir with tmp
files.
"""

import os

import numpy as np

from jtokkit_tpu.engine import charclass


def test_cache_write_and_reload(tmp_path, monkeypatch):
    path = str(tmp_path / "_charclass_test.npy")
    monkeypatch.setattr(charclass, "_cache_path", lambda: path)
    monkeypatch.setattr(charclass, "_CLASS_TABLE", None)

    t1 = charclass.class_table()
    assert os.path.exists(path), "cache file was not written"
    assert [f for f in os.listdir(tmp_path)] == ["_charclass_test.npy"], (
        "stray tmp files left behind"
    )

    # second load must come from disk (drop the in-memory handle and break
    # the builder so a rebuild would be caught)
    monkeypatch.setattr(charclass, "_CLASS_TABLE", None)
    monkeypatch.setattr(
        charclass, "_build_class_table",
        lambda: (_ for _ in ()).throw(AssertionError("rebuilt despite cache")),
    )
    t2 = charclass.class_table()
    np.testing.assert_array_equal(t1, t2)


def test_stale_tmp_files_cleaned(tmp_path, monkeypatch):
    path = str(tmp_path / "_charclass_test.npy")
    monkeypatch.setattr(charclass, "_cache_path", lambda: path)
    monkeypatch.setattr(charclass, "_CLASS_TABLE", None)
    stale = tmp_path / "_charclass_test.npy.tmp.1234.npy"
    stale.write_bytes(b"junk")

    charclass.class_table()
    assert not stale.exists(), "stale tmp file not removed"
    assert os.path.exists(path)
