"""IES LM-63 photometric file parser + spherical-texture conversion.

Python equivalent of the reference's ANSI-C parser (ies_parser/IESNA.C) and
``CreateSphericalTextureFromIES`` (ies_render.cpp:29-199): parse the candela
grid over (vertical, horizontal) angles, unfold the standard symmetries, and
resample onto a lat-long spherical texture indexed by
``sphereMapTo2DTexCoord`` angles (phi in [0, 2pi), theta in [0, pi]).
"""
from __future__ import annotations

import numpy as np


class IESData:
    def __init__(self, v_angles, h_angles, candela):
        self.v_angles = v_angles      # [NV] degrees, 0=down .. 180=up
        self.h_angles = h_angles      # [NH] degrees
        self.candela = candela        # [NH, NV]


def parse_ies(path: str) -> IESData:
    with open(path, errors='ignore') as f:
        text = f.read()
    lines = text.splitlines()
    i = 0
    # skip header until TILT line
    while i < len(lines) and not lines[i].strip().upper().startswith('TILT'):
        i += 1
    if i >= len(lines):
        raise ValueError(f'not an IES file: {path}')
    tilt = lines[i].split('=')[-1].strip().upper()
    i += 1
    if tilt == 'INCLUDE':
        # skip tilt data: lamp-to-luminaire, N pairs of angles and factors
        nums = []
        while len(nums) < 2 and i < len(lines):
            nums.extend(lines[i].split())
            i += 1
        n_pairs = int(float(nums[1]))
        need = 2 * n_pairs
        have = len(nums) - 2
        while have < need and i < len(lines):
            have += len(lines[i].split())
            i += 1

    # the numeric blob: 10 header values, then angles and candela
    vals = []
    for line in lines[i:]:
        vals.extend(float(x) for x in line.replace(',', ' ').split())
    n_lamps = int(vals[0])
    lumens = vals[1]
    mult = vals[2]
    nv = int(vals[3])
    nh = int(vals[4])
    # vals[5]=photometric type, vals[6]=units, 7,8,9=dims, then ballast etc.
    idx = 10
    idx += 3  # ballast factor, future use, input watts
    v_angles = np.array(vals[idx:idx + nv], np.float32); idx += nv
    h_angles = np.array(vals[idx:idx + nh], np.float32); idx += nh
    candela = np.array(vals[idx:idx + nv * nh], np.float32).reshape(nh, nv)
    candela *= mult
    return IESData(v_angles, h_angles, candela)


def ies_to_spherical_texture(path: str, width: int = 256, height: int = 256) -> np.ndarray:
    """Returns [H, W] float32 lat-long intensity texture (unnormalized).

    Texture coords follow sphereMapTo2DTexCoord (cglobals.h:349-358):
    x = phi/2pi, y = theta/pi with theta measured from +Y axis
    (the IES vertical angle 180-theta convention handled below).
    """
    data = parse_ies(path)
    v = data.v_angles
    h = data.h_angles
    c = data.candela

    # unfold horizontal symmetry (LM-63): last horizontal angle tells symmetry
    if len(h) == 1:
        h = np.array([0.0, 360.0], np.float32)
        c = np.vstack([c, c])
    elif abs(h[-1] - 90.0) < 1e-3:
        # quadrant symmetry: mirror to 180 then to 360
        h2 = np.concatenate([h, 180.0 - h[::-1][1:]])
        c2 = np.vstack([c, c[::-1][1:]])
        h = np.concatenate([h2, 360.0 - h2[::-1][1:]])
        c = np.vstack([c2, c2[::-1][1:]])
    elif abs(h[-1] - 180.0) < 1e-3:
        h = np.concatenate([h, 360.0 - h[::-1][1:]])
        c = np.vstack([c, c[::-1][1:]])
    # else: full 360 data

    # build lat-long image; theta: 0..180 deg from the IES nadir axis
    ys = (np.arange(height) + 0.5) / height * 180.0      # texture theta in deg
    xs = (np.arange(width) + 0.5) / width * 360.0        # texture phi in deg

    # vertical angles may cover only [0,90]; outside the measured range -> 0
    img = np.zeros((height, width), np.float32)
    # interpolate candela over (h, v) grid
    for yi, theta in enumerate(ys):
        if theta < v[0] or theta > v[-1]:
            continue
        vi = np.searchsorted(v, theta) - 1
        vi = np.clip(vi, 0, len(v) - 2)
        tv = (theta - v[vi]) / max(v[vi + 1] - v[vi], 1e-9)
        col = c[:, vi] * (1 - tv) + c[:, vi + 1] * tv   # [NH]
        img[yi, :] = np.interp(xs, h, col, period=360.0)
    return img
