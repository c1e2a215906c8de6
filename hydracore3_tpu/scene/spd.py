"""SPD (spectral power distribution) file loading.

Mirrors LoadSPDFromFile + Spectrum::ResampleUniform (spectrum.cpp:50-70,
42-48) and the LoadSceneSpectrumData driver (integrator_pt_scene.cpp:358-419):
every spectrum is resampled to the uniform 1nm grid [360, 830] and packed
into one flat array with an (offset, size) table.
"""
from __future__ import annotations

import numpy as np

from ..ops.spectrum import LAMBDA_MIN, LAMBDA_MAX


def load_spd_file(path: str) -> tuple[np.ndarray, np.ndarray]:
    """Returns (wavelengths, values) float32 arrays."""
    wl, vals = [], []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith('#'):
                continue
            parts = line.split()
            wl.append(float(parts[0]))
            vals.append(float(parts[1]))
    return np.array(wl, np.float32), np.array(vals, np.float32)


def resample_uniform(wl: np.ndarray, vals: np.ndarray) -> np.ndarray:
    """Sample on 1nm grid; zero outside the SPD's support (Spectrum::Sample)."""
    grid = np.arange(LAMBDA_MIN, LAMBDA_MAX + 1.0, 1.0, dtype=np.float32)
    if len(wl) == 0:
        return np.zeros_like(grid)
    res = np.interp(grid, wl, vals, left=0.0, right=0.0).astype(np.float32)
    res[grid < wl[0]] = 0.0
    res[grid > wl[-1]] = 0.0
    return res


def parse_spectrum_str(s: str) -> tuple[np.ndarray, np.ndarray]:
    """Inline 'lambda value lambda value ...' attribute."""
    vals = [float(x) for x in s.split()]
    arr = np.array(vals, np.float32).reshape(-1, 2)
    return arr[:, 0], arr[:, 1]


def load_scene_spectra(infos):
    """Returns (spec_values [P] f32, spec_offset_sz [S,2] i32,
    spec_tex_offset_sz [S,2] i32, spec_tex_texid [K] i32,
    spec_tex_wl [K] f32).

    Three spectrum kinds (LoadSceneSpectrumData, integrator_pt_scene.cpp:
    358-419): ``lambda_ref_ids`` -> per-wavelength TEXTURE references
    (KSPEC_SPD_TEX); inline ``value`` attribute; ``.spd`` file.
    """
    values = []
    offset_sz = []
    tex_offset_sz = []
    tex_texid = []
    tex_wl = []
    total = 0
    for info in infos:
        if getattr(info, 'lambda_ref_ids', None) is not None:
            pairs = info.lambda_ref_ids  # rows of (wavelength, tex_id)
            tex_offset_sz.append((len(tex_texid), len(pairs)))
            for wl_v, tid in pairs:
                tex_texid.append(int(tid))
                tex_wl.append(float(wl_v))
            offset_sz.append((0x7FFFFFFF, 0))
            continue
        if getattr(info, 'inline_value', None) is not None:
            wl, v = parse_spectrum_str(info.inline_value)
        else:
            try:
                wl, v = load_spd_file(info.path)
            except OSError:
                wl, v = np.zeros(0, np.float32), np.zeros(0, np.float32)
        uni = resample_uniform(wl, v)
        offset_sz.append((total, uni.size))
        tex_offset_sz.append((-1, 0))
        values.append(uni)
        total += uni.size
    if not offset_sz:
        # uniform-1 fallback spectrum (integrator_pt_scene.cpp:404-418)
        uni = resample_uniform(np.array([200.0, 400.0, 600.0, 800.0], np.float32),
                               np.ones(4, np.float32))
        values.append(uni)
        offset_sz.append((0, uni.size))
        tex_offset_sz.append((-1, 0))
    return (np.concatenate(values).astype(np.float32),
            np.array(offset_sz, np.int64).astype(np.int32),
            np.array(tex_offset_sz, np.int64).astype(np.int32),
            np.array(tex_texid if tex_texid else [0], np.int32),
            np.array(tex_wl if tex_wl else [0.0], np.float32))
