"""Drop-in import shim: ``import deconv3d`` → the TPU-native rebuild.

The reference library is imported as ``deconv3d`` (reference: the
``deconv3d`` package root, SURVEY.md §1.2 "API surface"); this module lets
existing user scripts keep their import lines while running on the
TPU-native rebuild:

    from deconv3d import Run, MUSE          # unchanged user code
    run = Run('cube.fits', MUSE(), max_iterations=10_000)
    run.run()
    run.save('my_deconv')

Everything here is a re-export of :mod:`deconv3d_tpu` — see
``docs/migration.md`` for the semantic differences that survive the rename
(the big one: ``max_iterations`` counts full sweeps, not single-spaxel
visits).  ``HyperspectralCube`` is the reference's cube class name
(SURVEY.md §2 "Cube data model"); here it is an alias of
:class:`deconv3d_tpu.Cube`, which carries the same data/variance/λ-WCS
payload and the same ``from_file``/``from_data``/``write`` entry points.
"""

from deconv3d_tpu import *  # noqa: F401,F403 — intentional facade re-export
from deconv3d_tpu import Cube, __all__ as _base_all, __version__  # noqa: F401

#: Reference class name for the cube data model (alias, not a subclass:
#: pytree registration is by class, and arithmetic/IO behave identically).
HyperspectralCube = Cube

__all__ = list(_base_all) + ["HyperspectralCube"]
