"""RCM reordering: validity, metric invariance, tile-density improvement."""

import numpy as np

from llp_tpu.data.reorder import apply_order, rcm_order
from llp_tpu.data.synthetic import community_features, sbm_graph
from llp_tpu.data.tiles import TILE, build_tiles


def test_rcm_is_permutation():
    ei, _ = sbm_graph(400, 4, 6.0, seed=1)
    order = rcm_order(ei, 400)
    assert np.array_equal(np.sort(order), np.arange(400))


def test_apply_order_preserves_graph():
    ei, comm = sbm_graph(200, 3, 5.0, seed=2)
    x = community_features(comm, 16, kind="gauss", seed=2)
    order = rcm_order(ei, 200)
    x2, ei2, inv = apply_order(x, ei, order)
    # Edge (u,v) -> (inv[u], inv[v]); features follow nodes.
    for k in range(0, ei.shape[1], 17):
        u, v = ei[0, k], ei[1, k]
        assert (ei2[0, k], ei2[1, k]) == (inv[u], inv[v])
        np.testing.assert_array_equal(x2[inv[u]], x[u])
    # degree multiset unchanged
    d1 = np.sort(np.bincount(ei[0], minlength=200))
    d2 = np.sort(np.bincount(ei2[0], minlength=200))
    np.testing.assert_array_equal(d1, d2)


def test_rcm_improves_tile_locality():
    # Hybrid accounting at the production threshold: RCM should cut the MXU
    # chunk count meaningfully on a clustered graph (≈38% at N=20k; ≥15% at
    # this smaller size) and shrink the residual.
    ei, comm = sbm_graph(4000, 8, 10.0, homophily=0.95, seed=3)
    x = community_features(comm, 8, kind="gauss", seed=3)

    def stats(edge_index):
        tiles, rr, _, _ = build_tiles(
            edge_index[1], edge_index[0], 4000, min_tile_edges=16
        )
        return int(tiles.tile_rows.shape[0]), int(rr.size)

    chunks_before, res_before = stats(ei)
    order = rcm_order(ei, 4000)
    _, ei2, _ = apply_order(x, ei, order)
    chunks_after, res_after = stats(ei2)
    assert chunks_after < chunks_before * 0.85, (chunks_before, chunks_after)
    assert res_after <= res_before
