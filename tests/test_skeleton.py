import numpy as np

from diffpose_tpu.skeleton import Skeleton

# Raw 32-joint Human3.6M kinematic tree (public dataset metadata;
# reference common/h36m_dataset.py:10-13).
H36M_32_PARENTS = [-1, 0, 1, 2, 3, 4, 0, 6, 7, 8, 9, 0, 11, 12, 13, 14, 12,
                   16, 17, 18, 19, 20, 19, 22, 12, 24, 25, 26, 27, 28, 27, 30]
H36M_32_LEFT = [6, 7, 8, 9, 10, 16, 17, 18, 19, 20, 21, 22, 23]
H36M_32_RIGHT = [1, 2, 3, 4, 5, 24, 25, 26, 27, 28, 29, 30, 31]
# Indices of the 17 moving joints (non-empty H36M_NAMES entries).
H36M_KEPT = [0, 1, 2, 3, 6, 7, 8, 12, 13, 14, 15, 17, 18, 19, 25, 26, 27]


def test_remove_static_joints_yields_17_joint_tree():
    sk = Skeleton(H36M_32_PARENTS, H36M_32_LEFT, H36M_32_RIGHT)
    removed = [i for i in range(32) if i not in H36M_KEPT]
    valid = sk.remove_joints(removed)
    assert valid == H36M_KEPT
    assert sk.num_joints() == 17
    # After the reference's shoulder rewiring (parents[10]=8? no — indices 11/14
    # to thorax=8), the edge set equals the runner edge list; before rewiring,
    # shoulders hang off joint 9 (reference h36m_dataset.py:276-278 rewires them).
    parents = sk.parents().copy()
    parents[11] = 8
    parents[14] = 8
    edges = {(int(p), c) for c, p in enumerate(parents) if p >= 0}
    from diffpose_tpu.graph import H36M_EDGES

    assert edges == set(H36M_EDGES)


def test_children_metadata_consistent():
    sk = Skeleton([-1, 0, 0, 1])
    assert sk.children()[0] == [1, 2]
    assert sk.children()[1] == [3]
    assert list(sk.has_children()) == [True, True, False, False]
    assert sk.edges() == ((0, 1), (0, 2), (1, 3))


def test_remove_joints_matches_reference_oracle():
    from tests.oracle import load_reference_module

    ref_skel = load_reference_module("common.skeleton")
    ref = ref_skel.Skeleton(
        parents=list(H36M_32_PARENTS),
        joints_left=list(H36M_32_LEFT),
        joints_right=list(H36M_32_RIGHT),
    )
    removed = [i for i in range(32) if i not in H36M_KEPT]
    ref.remove_joints(removed)

    ours = Skeleton(H36M_32_PARENTS, H36M_32_LEFT, H36M_32_RIGHT)
    ours.remove_joints(removed)

    np.testing.assert_array_equal(ours.parents(), ref.parents())
    assert ours.joints_left() == ref.joints_left()
    assert ours.joints_right() == ref.joints_right()
