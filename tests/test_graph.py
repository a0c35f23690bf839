import numpy as np
import pytest

from diffpose_tpu import graph
from tests.oracle import load_reference_module


def test_adjacency_triangle_hand_computed():
    # Triangle 0-1-2 plus self loops: every row has 3 ones → each entry 1/3.
    adj = graph.adjacency_from_edges(3, [(0, 1), (1, 2), (2, 0)])
    np.testing.assert_allclose(adj, np.full((3, 3), 1.0 / 3.0), atol=1e-7)


def test_adjacency_path_graph_hand_computed():
    # Path 0-1: rows [1,1;1,1]/2; isolated node 2 → row [0,0,1].
    adj = graph.adjacency_from_edges(3, [(0, 1)])
    expected = np.array([[0.5, 0.5, 0.0], [0.5, 0.5, 0.0], [0.0, 0.0, 1.0]])
    np.testing.assert_allclose(adj, expected, atol=1e-7)


def test_laplacian_rows_of_row_normalized_adjacency():
    # Row-normalized adjacency has unit row sums → D = I → L = I − A.
    adj = graph.adjacency_from_edges(17, graph.H36M_EDGES)
    lap = graph.normalized_laplacian(adj)
    np.testing.assert_allclose(lap, np.eye(17) - adj, atol=1e-7)


def test_chebyshev_recurrence():
    adj = graph.adjacency_from_edges(17, graph.H36M_EDGES)
    lap = graph.normalized_laplacian(adj)
    basis = graph.chebyshev_basis(lap, order=4)
    assert basis.shape == (5, 17, 17)
    np.testing.assert_allclose(basis[0], np.eye(17), atol=1e-12)
    np.testing.assert_allclose(basis[1], lap, atol=1e-12)
    for k in range(2, 5):
        np.testing.assert_allclose(
            basis[k], 2 * lap @ basis[k - 1] - basis[k - 2], atol=1e-10
        )


def test_learned_adjacency_laplacian_identity():
    # For Â = I: colsums are 1 → d = (1+eps)^-1/2 → L = I/(1+eps).
    lam = graph.learned_adjacency_laplacian(np.eye(4), eps=1e-5)
    np.testing.assert_allclose(lam, np.eye(4) / (1 + 1e-5), atol=1e-7)


def test_adjacency_matches_reference_oracle():
    chebconv = load_reference_module("models.ChebConv")
    import torch

    edges = torch.tensor(list(graph.H36M_EDGES), dtype=torch.long)
    ref = chebconv.adj_mx_from_edges(17, edges, sparse=False).numpy()
    ours = graph.adjacency_from_edges(17, graph.H36M_EDGES)
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_laplacian_and_basis_match_reference_oracle():
    chebconv = load_reference_module("models.ChebConv")
    import torch

    edges = torch.tensor(list(graph.H36M_EDGES), dtype=torch.long)
    adj_t = chebconv.adj_mx_from_edges(17, edges, sparse=False)
    lap_ref = chebconv.ChebConv.get_laplacian(adj_t, True).numpy()

    ours_adj = graph.adjacency_from_edges(17, graph.H36M_EDGES)
    lap = graph.normalized_laplacian(ours_adj)
    np.testing.assert_allclose(lap, lap_ref, atol=1e-5)

    conv = chebconv.ChebConv(2, 2, K=2)
    basis_ref = conv.cheb_polynomial(torch.from_numpy(lap.astype(np.float32))).numpy()
    basis = graph.cheb_basis_from_edges(17, graph.H36M_EDGES, order=2)
    np.testing.assert_allclose(basis, basis_ref, atol=1e-5)


def test_learned_adjacency_laplacian_matches_reference_oracle():
    graformer = load_reference_module("models.GraFormer")
    import torch

    rng = np.random.default_rng(0)
    a = rng.uniform(0.0, 1.0, size=(17, 17)).astype(np.float32)
    layer = graformer.LAM_Gconv(4, 4)
    ref = layer.laplacian_batch(torch.from_numpy(a)[None]).numpy()[0]
    ours = graph.learned_adjacency_laplacian(a)
    np.testing.assert_allclose(ours, ref, atol=1e-6)
