"""Fault injection: corrupt artifacts fail loudly at ingestion (SURVEY.md §5
failure-detection row — the reference trains silently on garbage)."""
import dataclasses

import numpy as np
import pytest

from pathnet_tpu.data import (DataValidationError, Graph, parse_path_file,
                              validate_graph, validate_masks,
                              validate_path_tensor)


def _graph(**kw):
    base = dict(n=4, src=np.array([0, 1, 2], np.int32),
                dst=np.array([1, 2, 3], np.int32),
                prob=np.ones(3), name="t")
    base.update(kw)
    return Graph(**base)


def test_valid_graph_passes():
    validate_graph(_graph(features=np.ones((4, 2), np.float32),
                          labels=np.zeros(4, np.int64)))


@pytest.mark.parametrize("mutation, msg", [
    (dict(dst=np.array([1, 2, 9], np.int32)), "outside"),
    (dict(prob=np.array([1.0, np.nan, 1.0])), "non-finite"),
    (dict(prob=np.array([1.0, -0.5, 1.0])), "negative"),
    (dict(features=np.full((4, 2), np.inf, np.float32)), "non-finite"),
    (dict(features=np.ones((3, 2), np.float32)), "rows"),
    (dict(labels=np.array([0, 1, -2, 0])), "below -1"),
    (dict(src=np.array([0, 1], np.int32)), "ragged"),
])
def test_corrupt_graph_rejected(mutation, msg):
    with pytest.raises(DataValidationError, match=msg):
        validate_graph(_graph(**mutation))


def test_overlapping_masks_rejected():
    m = np.zeros(6, bool)
    a, b = m.copy(), m.copy()
    a[:3] = True
    b[2:] = True
    with pytest.raises(DataValidationError, match="overlap"):
        validate_masks("t", 6, a, b)
    with pytest.raises(DataValidationError, match="shape"):
        validate_masks("t", 6, np.zeros(5, bool))


def test_path_tensor_checks():
    nodes = np.zeros((2, 3, 4), np.int32)
    dists = np.zeros((2, 3, 4), np.int32)
    validate_path_tensor("t", nodes, dists, n=5, walk_len=4)
    bad = nodes.copy(); bad[0, 0, 0] = 7
    with pytest.raises(DataValidationError, match="node id"):
        validate_path_tensor("t", bad, dists, n=5, walk_len=4)
    badd = dists.copy(); badd[0, 0, 0] = 4
    with pytest.raises(DataValidationError, match="distance"):
        validate_path_tensor("t", nodes, badd, n=5, walk_len=4)


def test_malformed_path_file_named_line(tmp_path):
    p = tmp_path / "bad.txt"
    p.write_text("[0, 1, 2, 3, 0, 0, 1, 2]\n[0, 1, garbled]\n")
    with pytest.raises(ValueError, match="bad.txt:2"):
        parse_path_file(str(p), walk_len=4)


def test_short_record_named_line(tmp_path):
    p = tmp_path / "short.txt"
    # one good record so sizes don't divide evenly, then a short one
    p.write_text("[0, 1, 2, 3, 0, 0, 1, 2]\n[0, 1, 2]\n")
    with pytest.raises(ValueError, match="fields"):
        parse_path_file(str(p), walk_len=4)


def test_load_dataset_validates(monkeypatch):
    """Corrupting a stand-in payload at assembly is caught by load_dataset."""
    from pathnet_tpu.data import registry

    real = registry.attach_synthetic_payload

    def corrupt(g, *a, **k):
        g = real(g, *a, **k)
        feats = g.features.copy()
        feats[0, 0] = np.nan
        return dataclasses.replace(g, features=feats)

    monkeypatch.setattr(registry, "attach_synthetic_payload", corrupt)
    # the payload caches (in-process AND the on-disk fingerprint cache)
    # would otherwise serve a clean graph assembled earlier, bypassing the
    # monkeypatched assembly entirely — point data_root at a tmpdir (the
    # edge-file lookup falls back to the repo data dir; the disk cache
    # does not)
    registry.clear_payload_cache()
    import tempfile
    with tempfile.TemporaryDirectory() as tmp:
        # Nba: real edge structure (data/edge_input/Nba.in) + synthetic payload
        with pytest.raises(DataValidationError, match="non-finite"):
            registry.load_dataset("Nba", tmp, 0)
    registry.clear_payload_cache()     # do not leak the corrupted payload
