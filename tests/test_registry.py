import numpy as np
import pytest

from pathnet_tpu.data import DATASETS, load_dataset
from pathnet_tpu.data.registry import load_structure
from pathnet_tpu.data.synthetic import path_pattern_labels
from pathnet_tpu.data import Graph


def test_registry_covers_reference_suite():
    """Every dataset in the reference's published table (SURVEY.md §6.1) +
    Dblp (README.md:70-77) is registered."""
    for name in ("cornell", "cora", "citeseer", "pubmed", "Nba", "bgp",
                 "Electronics", "Dblp"):
        assert name in DATASETS


def test_load_cornell_real_structure():
    g, tr, va, te, spec = load_dataset("cornell", data_root="data")
    assert g.n == 183
    assert len(g.src) == 1474          # the checked-in edge records
    assert g.features.shape == (183, 1703)
    assert g.labels.shape == (183,)
    assert spec.variant == "hetero"
    # disjoint masks
    assert not (tr & va).any() and not (va & te).any() and not (tr & te).any()


def test_load_nba_real_structure_random_split_seeded():
    g0, tr0, va0, te0, _ = load_dataset("Nba", data_root="data", round_i=0)
    g1, tr1, va1, te1, _ = load_dataset("Nba", data_root="data", round_i=0)
    g2, tr2, _, _, _ = load_dataset("Nba", data_root="data", round_i=1)
    assert g0.n == 403
    np.testing.assert_array_equal(tr0, tr1)    # deterministic per round
    assert not np.array_equal(tr0, tr2)        # varies across rounds
    # 48/32/20 split over labeled nodes (data_loader.py:105)
    labeled = (g0.labels >= 0).sum()
    assert abs(tr0.sum() - 0.48 * labeled) < 2


def test_synthetic_standin_for_missing_structure():
    g = load_structure("pubmed", data_root="data")
    assert g.n == 19717


def test_path_pattern_labels_line_graph():
    """gen_cora_syn.cpp semantics: label = argmax over parity-bitmask counts
    of all length-3 walks."""
    # triangle graph 0-1-2 with both directions
    src = np.array([0, 1, 1, 2, 2, 0], np.int32)
    dst = np.array([1, 0, 2, 1, 0, 2], np.int32)
    g = Graph(n=3, src=src, dst=dst, prob=np.ones(6))
    y = path_pattern_labels(g, walk_len=3)
    assert y.shape == (3,)
    assert (y >= 0).all() and (y < 16).all()
    # node 0 (parity 0): walks alternate between parity-1 (node 1) and
    # parity-0 (nodes 0/2); recompute one count by hand: all walks of len 3
    # from 0 over this symmetric triangle = 2^3 = 8 walks
    # (deterministic structural sanity only)


def test_payload_fingerprint_tracks_calibration_knobs():
    """Fingerprints must change with any payload-shaping knob and be stable
    across processes (used to invalidate stale result rows/checkpoints)."""
    import dataclasses

    from pathnet_tpu.data.registry import DATASETS, payload_fingerprint

    spec = DATASETS["cornell"]
    fp = payload_fingerprint(spec)
    assert fp == payload_fingerprint(spec)           # deterministic
    for field, val in [("signal", spec.signal + 0.01),
                       ("structure", spec.structure + 0.01),
                       ("label_noise", spec.label_noise + 0.01),
                       ("offdiag", "shift" if spec.offdiag != "shift"
                        else "matching")]:
        assert payload_fingerprint(
            dataclasses.replace(spec, **{field: val})) != fp


def test_payload_cache_returns_identical_graph():
    """load_dataset caches the generated payload keyed by fingerprint; the
    cached graph must be the same object (no re-annealing per round)."""
    from pathnet_tpu.data.registry import load_dataset

    g0, *_ = load_dataset("cornell", data_root="data", round_i=0)
    g1, *_ = load_dataset("cornell", data_root="data", round_i=3)
    assert g0 is g1
