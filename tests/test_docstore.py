"""TsvDocStore: mmap'd id -> passage lookups + sidecar lifecycle."""
import os
import time

import numpy as np
import pytest

from cldrd_tpu.data import TsvDocStore, load_passages
from cldrd_tpu.data.docstore import _sidecar_path


@pytest.fixture()
def tsv(tmp_path):
    p = tmp_path / "passages.tsv"
    rows = [
        (7, "seven is a passage about sevens"),
        (100, "one hundredé unicode text"),  # non-ascii survives
        (3, "three comes after seven in file order"),
        (42, "answer to everything"),
    ]
    p.write_text("".join(f"{i}\t{t}\n" for i, t in rows), encoding="utf-8")
    return str(p)


def test_matches_load_passages(tsv):
    store = TsvDocStore(tsv)
    full = load_passages(tsv)
    assert len(store) == len(full)
    for pid, text in full.items():
        assert pid in store
        assert store.get(pid) == text


def test_get_many_request_order(tsv):
    store = TsvDocStore(tsv)
    got = store.get_many([42, 7, 100])
    assert got[0] == "answer to everything"
    assert got[1].startswith("seven")
    assert "unicode" in got[2]
    assert store.get_many([]) == []


def test_missing_id_raises_keyerror_naming_ids(tsv):
    store = TsvDocStore(tsv)
    with pytest.raises(KeyError, match="999"):
        store.get_many([7, 999])
    assert 999 not in store


def test_titled_rows_match_load_passages(tmp_path):
    p = tmp_path / "titled.tsv"
    p.write_text("5\tThe Title\tbody text\n9\tplain\n", encoding="utf-8")
    store = TsvDocStore(str(p))
    assert store.get(5) == load_passages(str(p))[5]
    assert store.get(5) == {"title": "The Title", "para": "body text"}
    assert store.get(9) == "plain"


def test_sidecar_reused_then_invalidated(tsv):
    TsvDocStore(tsv)
    sc = _sidecar_path(tsv)
    assert os.path.exists(sc)
    first = os.stat(sc).st_mtime_ns
    assert TsvDocStore(tsv).get(42) == "answer to everything"
    assert os.stat(sc).st_mtime_ns == first  # reopened without a rebuild
    time.sleep(0.01)
    with open(tsv, "a", encoding="utf-8") as f:
        f.write("77\tnew row\n")
    store = TsvDocStore(tsv)  # stale sidecar detected and rebuilt
    assert store.get(77) == "new row"
    assert len(store) == 5


def test_corrupt_sidecar_rebuilds(tsv):
    TsvDocStore(tsv)
    with open(_sidecar_path(tsv), "wb") as f:
        f.write(b"not a zip")
    assert TsvDocStore(tsv).get(7).startswith("seven")


def test_missing_trailing_newline(tmp_path):
    p = tmp_path / "no_nl.tsv"
    with open(p, "w", encoding="utf-8") as f:
        f.write("1\tfirst\n2\tlast line no newline")
    store = TsvDocStore(str(p))
    assert store.get(2) == "last line no newline"


def test_rejects_untabbed_and_duplicate(tmp_path):
    bad = tmp_path / "bad.tsv"
    bad.write_text("1 no tab here\n", encoding="utf-8")
    with pytest.raises(ValueError, match="tab"):
        TsvDocStore(str(bad))
    dup = tmp_path / "dup.tsv"
    dup.write_text("1\ta\n1\tb\n", encoding="utf-8")
    with pytest.raises(ValueError, match="duplicate"):
        TsvDocStore(str(dup))


def test_scales_and_arbitrary_id_order(tmp_path):
    rng = np.random.default_rng(0)
    ids = rng.permutation(5000) * 3 + 1  # sparse, shuffled ids
    p = tmp_path / "big.tsv"
    with open(p, "w", encoding="utf-8") as f:
        for i in ids:
            f.write(f"{i}\tpassage number {i}\n")
    store = TsvDocStore(str(p), sidecar=False)
    probe = rng.choice(ids, size=64, replace=False)
    assert store.get_many(probe) == [f"passage number {i}" for i in probe]
