"""Driver entry-point contract tests (CPU virtual mesh)."""

import sys

sys.path.insert(0, "/root/repo")


def test_dryrun_multichip_8():
    import __graft_entry__ as g
    g.dryrun_multichip(8)  # asserts finite loss internally


def test_entry_signature():
    import __graft_entry__ as g
    fn, args = g.entry()
    assert callable(fn)
    assert len(args) == 4  # params, image, intrinsics, pose
    # traceable (no compile): abstract eval only
    import jax
    shapes = jax.eval_shape(fn, *args)
    rgb, disp = shapes
    assert rgb.shape == (1, 256, 768, 3)
    assert disp.shape == (1, 2, 256, 768, 1)


def test_dryrun_multichip_2():
    import __graft_entry__ as g
    g.dryrun_multichip(2)
