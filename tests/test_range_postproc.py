"""RangeNet++ post-processing: borderMask vs the reference's documented
example grid, CRF sanity (prob simplex, smoothing behaviour).
Reference: rangenet/postproc/{borderMask.py:16-90, CRF.py:12-130}.
"""
import jax.numpy as jnp
import numpy as np

from openpcseg_tpu.ops.range_postproc import border_mask, crf_refine


def make_example_grid():
    """The 20x20 3-class example from the reference borderMask docstring."""
    g = np.zeros((20, 20), np.int32)
    g[3:13, 3:13] = 1
    g[13:18, 13:18] = 2
    return g


def test_border_mask_example_one_erosion():
    g = make_example_grid()
    m = np.asarray(border_mask(jnp.asarray(g[None]), num_class=3,
                               border_size=1, kern_conn=4,
                               background_class=0))[0]
    # interiors of both bodies survive the erosion (not border)
    assert not m[8, 8]       # deep inside class 1
    assert not m[15, 15]     # deep inside class 2
    # with the background folded into every class (reference
    # borderMask.py:150-155), class-vs-background edges are NOT borders...
    assert not m[3, 5]       # top edge of class-1 block vs background
    # image-boundary pixels erode away under zero padding (same as the
    # reference's F.conv2d) -> the perimeter is border; interior bg is not
    assert m[0, 0]
    assert not m[1, 1]
    # exactly perimeter (76 px) + the two junction pixels
    assert m.sum() == 78
    # ...only class-vs-class junctions are: the 1/2 diagonal contact zone
    assert m[12, 13] and m[13, 12]


def test_border_mask_grows_with_border_size():
    g = make_example_grid()
    m1 = np.asarray(border_mask(jnp.asarray(g[None]), 3, border_size=1,
                                background_class=0))[0]
    m2 = np.asarray(border_mask(jnp.asarray(g[None]), 3, border_size=2,
                                background_class=0))[0]
    assert m2.sum() > m1.sum()
    assert np.all(m2[m1])    # monotone growth


def test_crf_refine_keeps_simplex_and_smooths():
    rng = np.random.default_rng(0)
    b, h, w, c = 1, 8, 16, 4
    xyz = np.zeros((b, h, w, 3), np.float32)
    xyz[..., 0] = np.linspace(0, 2, w)[None, None, :]
    logits = rng.normal(size=(b, h, w, c)).astype(np.float32)
    sm = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    mask = np.ones((b, h, w), bool)

    out = np.asarray(crf_refine(jnp.asarray(xyz), jnp.asarray(sm),
                                jnp.asarray(mask), iters=3))
    np.testing.assert_allclose(out.sum(-1), 1.0, rtol=1e-5)
    assert out.shape == sm.shape
    # smoothing: neighbour disagreement (total variation) must not grow
    def tv(x):
        return (np.abs(np.diff(x, axis=1)).sum()
                + np.abs(np.diff(x, axis=2)).sum())
    assert tv(out) < tv(sm)


def test_crf_invalid_pixels_masked():
    rng = np.random.default_rng(1)
    b, h, w, c = 1, 6, 6, 3
    xyz = rng.normal(size=(b, h, w, 3)).astype(np.float32)
    sm = np.full((b, h, w, c), 1.0 / c, np.float32)
    mask = np.zeros((b, h, w), bool)
    mask[:, :3] = True
    out = np.asarray(crf_refine(jnp.asarray(xyz), jnp.asarray(sm),
                                jnp.asarray(mask), iters=1))
    # output still a simplex everywhere (renormalized even where masked)
    np.testing.assert_allclose(out.sum(-1), 1.0, rtol=1e-5)
