"""Exactly-invertible data-layout transforms (NHWC).

TPU-native equivalents of the reference's squeeze/patching views:
- space_to_depth / depth_to_space: the `ExtendDim` squeeze
  (reference: extenddim.py:18-37), re-laid-out for NHWC so channels stay in
  the 128-lane dimension.
- patch_split / patch_merge: the `Patching` tiler (extenddim.py:41-67) that
  turns B x H x W x C images into (B * H/h * W/w) x h x w x C tiles; tiles
  are the natural sharding unit for the `tile` mesh axis.

All are pure reshapes/transposes: zero FLOPs, exact inverses by construction.
The channel ordering after squeeze is our own (sub-pixel-major) convention;
forward/backward are self-consistent which is all the flow contract needs.
"""

from __future__ import annotations



def space_to_depth(x, scale: int = 2):
    """[B, H, W, C] -> [B, H/s, W/s, C*s*s]."""
    if scale == 1:
        return x
    b, h, w, c = x.shape
    x = x.reshape(b, h // scale, scale, w // scale, scale, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // scale, w // scale, scale * scale * c)


def depth_to_space(x, scale: int = 2):
    """Exact inverse of space_to_depth."""
    if scale == 1:
        return x
    b, h, w, cs = x.shape
    c = cs // (scale * scale)
    x = x.reshape(b, h, w, scale, scale, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h * scale, w * scale, c)


def patch_split(x, h: int, w: int):
    """[B, H, W, C] -> [B * (H//h) * (W//w), h, w, C]."""
    b, H, W, c = x.shape
    assert H % h == 0 and W % w == 0, (H, W, h, w)
    x = x.reshape(b, H // h, h, W // w, w, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b * (H // h) * (W // w), h, w, c)


def patch_merge(x, H: int, W: int):
    """Exact inverse of patch_split."""
    n, h, w, c = x.shape
    hh, ww = H // h, W // w
    b = n // (hh * ww)
    x = x.reshape(b, hh, ww, h, w, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, H, W, c)
