"""Hyperspectral cube data model — a JAX pytree.

TPU-native replacement for the reference's ``HyperspectralCube`` layer
(reference: deconv3d's cube I/O / data model; SURVEY.md §1.2, §2 "Cube data
model").  Where the reference wraps ``astropy.io.fits`` with a mutable NumPy
container, this is an immutable pytree dataclass so cubes flow through
``jit``/``vmap``/``shard_map`` directly; FITS and NPZ I/O happen only at the
host boundary.

Axis convention: ``data[nlambda, ny, nx]`` (λ first — matches the FITS NAXIS3
spectral axis of MUSE products once loaded into C order).

Spectral WCS is carried as static metadata (crval/cdelt/crpix, FITS 1-based),
so tracing never depends on it.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .io import fits as fitsio


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Cube:
    """Immutable hyperspectral cube: data + variance + mask + spectral WCS.

    Attributes:
      data:     ``[nlambda, ny, nx]`` flux values.
      variance: same shape, per-voxel noise variance, or None.
      mask:     ``[ny, nx]`` bool, True = spaxel EXCLUDED (reference C8
                semantics: masked spaxels are skipped by the sampler and
                excluded from chi²), or None.
      crval/cdelt/crpix: spectral axis WCS (Angstrom; FITS 1-based crpix).
      header:   passthrough FITS cards as a tuple of ``(key, value)`` pairs
                (hashable → jit-static).  Carries everything the loader
                parsed beyond the spectral axis — spatial WCS (CRVAL1/2,
                CRPIX1/2, CD matrix, CTYPE1/2), units, instrument cards —
                so a real MUSE product's astrometry survives the round trip
                through ``Run.save()`` (reference parity: the reference's
                HyperspectralCube keeps the full header; SURVEY.md §2
                "Cube data model").
    """

    data: jax.Array
    variance: Optional[jax.Array] = None
    mask: Optional[jax.Array] = None
    crval: float = dataclasses.field(default=0.0, metadata=dict(static=True))
    cdelt: float = dataclasses.field(default=1.0, metadata=dict(static=True))
    crpix: float = dataclasses.field(default=1.0, metadata=dict(static=True))
    header: tuple = dataclasses.field(default=(), metadata=dict(static=True))

    @property
    def header_dict(self) -> dict:
        """Passthrough header cards as a plain dict (insertion-ordered)."""
        return dict(self.header)

    # -- shape helpers ------------------------------------------------------
    @property
    def shape(self) -> tuple:
        return tuple(self.data.shape)

    @property
    def nlambda(self) -> int:
        return self.data.shape[0]

    @property
    def ny(self) -> int:
        return self.data.shape[1]

    @property
    def nx(self) -> int:
        return self.data.shape[2]

    def wavelengths(self) -> np.ndarray:
        """Wavelength of each spectral plane (host-side, float64)."""
        i = np.arange(self.data.shape[0], dtype=np.float64)
        return self.crval + (i + 1.0 - self.crpix) * self.cdelt

    # -- construction -------------------------------------------------------
    @classmethod
    def from_data(
        cls,
        data,
        variance=None,
        mask=None,
        crval: float = 0.0,
        cdelt: float = 1.0,
        crpix: float = 1.0,
        dtype=jnp.float32,
        header=(),
    ) -> "Cube":
        data = jnp.asarray(data, dtype=dtype)
        if data.ndim != 3:
            raise ValueError(f"Cube data must be 3-D [lambda,y,x], got {data.shape}")
        if variance is not None:
            variance = jnp.asarray(variance, dtype=dtype)
            if variance.shape != data.shape:
                # scalar (constant noise) and broadcastable shapes are
                # accepted; anything else is a real user error
                try:
                    variance = jnp.broadcast_to(variance, data.shape)
                except ValueError:
                    raise ValueError(
                        f"variance shape {variance.shape} is not "
                        f"broadcastable to data shape {data.shape}"
                    ) from None
        if mask is not None:
            mask = jnp.asarray(mask, dtype=bool)
            if mask.shape != data.shape[1:]:
                raise ValueError("mask must be [ny, nx]")
        return cls(
            data=data, variance=variance, mask=mask,
            crval=float(crval), cdelt=float(cdelt), crpix=float(crpix),
            header=tuple(header.items()) if isinstance(header, dict)
            else tuple(header),
        )

    # FITS cards NOT carried in the passthrough header: structural keys the
    # writer regenerates, and the spectral axis, which lives in the
    # crval/cdelt/crpix fields (written back as CRVAL3/CDELT3/CRPIX3).
    _NON_PASSTHROUGH = frozenset(
        {"SIMPLE", "XTENSION", "BITPIX", "NAXIS", "PCOUNT", "GCOUNT",
         "EXTEND", "EXTNAME", "BSCALE", "BZERO",
         "CRVAL3", "CDELT3", "CD3_3", "CRPIX3", "CTYPE3", "CUNIT3"}
        | {f"NAXIS{i}" for i in range(1, 10)}
    )

    @classmethod
    def _passthrough_cards(cls, *headers) -> tuple:
        """Merge headers (later wins) into the passthrough card tuple."""
        merged: dict = {}
        for hdr in headers:
            for key, value in hdr.items():
                if key.upper() not in cls._NON_PASSTHROUGH:
                    merged[key] = value
        return tuple(merged.items())

    @classmethod
    def from_fits(cls, path: str, dtype=jnp.float32) -> "Cube":
        """Load a MUSE-style FITS cube (DATA + optional STAT extension).

        The full header payload (spatial WCS astrometry, units, instrument
        cards — primary merged with the data HDU, data HDU winning) rides
        along in ``self.header`` and is written back by :meth:`to_fits`.
        """
        hdus = fitsio.read(path)
        data_hdu, stat_hdu = fitsio.find_cube_hdus(hdus)
        crval, cdelt, crpix = fitsio.spectral_wcs(data_hdu.header)
        if (crval, cdelt, crpix) == (0.0, 1.0, 1.0) and hdus[0] is not data_hdu:
            crval, cdelt, crpix = fitsio.spectral_wcs(hdus[0].header)
        header = (
            cls._passthrough_cards(hdus[0].header, data_hdu.header)
            if hdus[0] is not data_hdu
            else cls._passthrough_cards(data_hdu.header)
        )
        variance = stat_hdu.data if stat_hdu is not None else None
        return cls.from_data(
            np.ascontiguousarray(data_hdu.data),
            variance=None if variance is None else np.ascontiguousarray(variance),
            crval=crval, cdelt=cdelt, crpix=crpix, dtype=dtype,
            header=header,
        )

    @classmethod
    def from_file(cls, path: str, dtype=jnp.float32) -> "Cube":
        """Load a cube by file extension (reference parity: the reference's
        HyperspectralCube.from_file, SURVEY.md §2 "Cube data model").

        ``.npz`` loads the NPZ layout; anything else is treated as FITS.
        """
        if path.endswith(".npz"):
            return cls.from_npz(path, dtype=dtype)
        return cls.from_fits(path, dtype=dtype)

    @classmethod
    def from_npz(cls, path: str, dtype=jnp.float32) -> "Cube":
        with np.load(path) as z:
            header = ()
            if "header_json" in z:
                import json

                header = tuple(json.loads(str(z["header_json"])).items())
            return cls.from_data(
                z["data"],
                variance=z["variance"] if "variance" in z else None,
                mask=z["mask"] if "mask" in z else None,
                crval=float(z.get("crval", 0.0)),
                cdelt=float(z.get("cdelt", 1.0)),
                crpix=float(z.get("crpix", 1.0)),
                dtype=dtype,
                header=header,
            )

    # -- persistence ---------------------------------------------------------
    def to_fits(self, path: str, header_extra: Optional[dict] = None) -> None:
        """Write MUSE-pipeline layout: empty primary + DATA (+ STAT) HDUs.

        The passthrough ``header`` cards (spatial WCS etc.) are written to
        every HDU, then the spectral axis from the cube's own fields, then
        ``header_extra`` (highest precedence).
        """
        wcs_cards: dict[str, Any] = dict(self.header)
        wcs_cards.update({
            "CRVAL3": self.crval, "CDELT3": self.cdelt, "CRPIX3": self.crpix,
            "CTYPE3": "AWAV", "CUNIT3": "Angstrom",
        })
        if header_extra:
            wcs_cards.update(header_extra)
        hdus = [fitsio.HDU(header=dict(wcs_cards))]
        hdus.append(
            fitsio.HDU(
                header={"EXTNAME": "DATA", **wcs_cards},
                data=np.asarray(self.data, dtype=np.float32),
            )
        )
        if self.variance is not None:
            hdus.append(
                fitsio.HDU(
                    header={"EXTNAME": "STAT", **wcs_cards},
                    data=np.asarray(self.variance, dtype=np.float32),
                )
            )
        fitsio.write(path, hdus)

    def write(self, path: str, header_extra: Optional[dict] = None) -> None:
        """Write by file extension (reference parity: HyperspectralCube
        .write()).  ``.npz`` writes the NPZ layout (header cards — including
        ``header_extra`` — stored as a JSON field); anything else FITS."""
        if path.endswith(".npz"):
            self.to_npz(path, header_extra=header_extra)
        else:
            self.to_fits(path, header_extra=header_extra)

    def to_npz(self, path: str, header_extra: Optional[dict] = None) -> None:
        out = {"data": np.asarray(self.data), "crval": self.crval,
               "cdelt": self.cdelt, "crpix": self.crpix}
        if self.variance is not None:
            out["variance"] = np.asarray(self.variance)
        if self.mask is not None:
            out["mask"] = np.asarray(self.mask)
        cards = dict(self.header)
        if header_extra:
            cards.update(header_extra)
        if cards:
            import json

            out["header_json"] = np.str_(json.dumps(cards))
        np.savez(path, **out)

    # -- sanitisation --------------------------------------------------------
    def sanitized(self, default_variance: Optional[float] = None) -> "Cube":
        """NaN-clean cube ready for sampling.

        * NaN data voxels → 0 flux with infinite variance (zero weight).
        * Missing variance → ``default_variance`` (or the variance of the data
          itself as a crude noise floor, matching the reference's fallback).
        * All-NaN spaxels are folded into the exclusion mask.
        """
        data = self.data
        nan = jnp.isnan(data)
        if self.variance is None:
            if default_variance is None:
                default_variance = float(
                    jnp.nanvar(jnp.where(nan, jnp.nan, data))
                )
                if not np.isfinite(default_variance) or default_variance <= 0:
                    default_variance = 1.0
            variance = jnp.full_like(data, default_variance)
        else:
            variance = jnp.where(
                jnp.isnan(self.variance) | (self.variance <= 0),
                jnp.inf, self.variance,
            )
        variance = jnp.where(nan, jnp.inf, variance)
        data = jnp.where(nan, 0.0, data)
        dead = jnp.all(nan, axis=0)
        mask = dead if self.mask is None else (self.mask | dead)
        return dataclasses.replace(self, data=data, variance=variance, mask=mask)

    # -- arithmetic (convenience parity with HyperspectralCube) --------------
    def _binop(self, other, op) -> "Cube":
        other_data = other.data if isinstance(other, Cube) else other
        return dataclasses.replace(self, data=op(self.data, other_data))

    def __add__(self, other):
        return self._binop(other, jnp.add)

    def __sub__(self, other):
        return self._binop(other, jnp.subtract)

    def __mul__(self, other):
        return self._binop(other, jnp.multiply)

    def __truediv__(self, other):
        return self._binop(other, jnp.divide)
