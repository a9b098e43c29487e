"""Basic end-to-end deconvolution of a synthetic MUSE-style subcube.

Runs anywhere (seconds on TPU, ~1 minute on CPU).  The flow mirrors the
reference workflow: build/observe a cube, hand it to ``Run`` with an
instrument model, sample, inspect diagnostics, save FITS products.

    python examples/basic_deconvolution.py
"""

import numpy as np

import deconv3d_tpu as d3d

# --- a synthetic scene: one emission-line point source ---------------------
L, Y, X = 32, 16, 16
truth = np.zeros((L, Y, X), np.float32)
truth[16, 8, 8] = 100.0

cube = d3d.Cube.from_data(truth, crval=4750.0, cdelt=1.25)
muse = d3d.MUSE()                      # Moffat FSF + MUSE UDF LSF defaults

# forward-model the observation and add noise
observed = muse.convolve(cube)
rng = np.random.default_rng(0)
noise = 0.05
data = np.asarray(observed.data) + rng.normal(0, noise, truth.shape)
noisy = d3d.Cube.from_data(
    data.astype(np.float32),
    variance=np.full(truth.shape, noise**2, np.float32),
    crval=4750.0, cdelt=1.25,
)

# --- deconvolve ------------------------------------------------------------
# sampler='gibbs' draws each voxel exactly from its conditional
# (acceptance 1, no tuning) and reaches the noise floor far faster than
# the reference's MH — use 'mh' for the reference-parity behaviour.
run = d3d.Run(noisy, muse, max_iterations=400, sampler="gibbs")
run.run()

print(f"chi2/dof        : {run.chi2 / truth.size:.4f}  (expect ≈ 1)")
print(f"acceptance rate : {run.acceptance_rate:.3f}")
print(f"diagnostics     : {run.diagnostics()}")

# the CONVOLVED posterior mean must reproduce the blurred truth; the
# deconvolved cube concentrates flux back toward the injected voxel but
# its per-voxel values carry large blur-null posterior variance — always
# compare fluxes through the forward model.
recon = np.asarray(run.convolved_cube().data)
peak = np.unravel_index(np.argmax(recon), recon.shape)
print(f"reconvolved peak: {peak}  (injected at (16, 8, 8))")

run.save("deconv_out")                 # FITS cubes + traces + stats JSON
print("wrote deconv_out*")

# Deterministic MAP point estimate (no MCMC): the posterior mean of the
# linear-Gaussian model by preconditioned CG — useful as a fast first
# look or a convergence cross-check for the chains above.  The same
# forward-model rule applies: under heavy blur the raw MAP voxels carry
# the blur-null indeterminacy, so inspect the CONVOLVED MAP.
map_cube = run.map_estimate(tol=2e-4, maxiter=2500)
map_conv = np.asarray(muse.convolve(map_cube).data)
peak_map = np.unravel_index(np.argmax(map_conv), map_conv.shape)
print(f"MAP reconv peak : {peak_map}  (injected at (16, 8, 8))")
