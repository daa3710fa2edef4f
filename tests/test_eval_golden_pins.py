"""End-to-end golden pins for the eval chain (VERDICT r03 next #4a).

A fixed-seed random-weight InceptionV3 (tf2015 variant) over a
deterministic synthetic batch must reproduce pinned Inception-score and
FID values to tight tolerances: any silent numerics drift anywhere in the
399-line ``eval/inception.py`` + ``inception_net.py`` + ``fid.py`` chain —
resize, pooling quirks, preprocessing whitepoint, trunk forward, device
reductions, split-KL, Frechet distance — fails this test loudly.

The raw ``init_params`` scale (1/sqrt(fan_in)) washes out input signal
over the ~47-conv trunk (ReLU halves variance per layer), giving the
degenerate IS=1.0/FID=0.0 that any wrong implementation also produces.
The pins therefore use He-scaled kernels (x sqrt(2), variance-preserving)
with the fc head amplified (x20) so predictions are input-dependent and
diverse: IS != 1, FID != 0, and every stage's output depends on every
stage before it.

Pinned values were produced by this exact recipe on jax's CPU backend
(conftest pins the suite there); reference eval protocol:
``/root/reference/utils/inception.py:24-52`` (score math),
``train.py:245-273`` (sampling loop).
"""

import numpy as np
import jax.numpy as jnp

from otgan_tpu.eval import fid as fid_mod
from otgan_tpu.eval import inception as inc
from otgan_tpu.eval import inception_net

# golden values (recipe in docstring; regenerate ONLY for an intentional,
# understood numerics change — record why in the commit message)
IS_MEAN = 1.0160765195518469
IS_STD = 0.0010448366920140506
MU_NORM = 25.178570896546223
SIG_TRACE = 0.30917493054585166
REF_MU_NORM = 25.237122748069535
FID = 0.27727853457426554


def _scaled_params():
    def rec(t, in_fc):
        out = {}
        for k, v in t.items():
            if isinstance(v, dict):
                out[k] = rec(v, in_fc or k == "fc")
            elif k in ("mean", "bias", "b", "var", "scale"):
                out[k] = v
            else:
                out[k] = v * np.float32(
                    20.0 if (in_fc or k == "fc") else np.sqrt(2.0)
                )
        return out

    rng = np.random.default_rng(2024)
    return rec(inception_net.init_params(rng, num_classes=1008), False)


def test_eval_chain_golden_pins(monkeypatch):
    monkeypatch.setattr(inc, "_BATCH", 16)
    params = _scaled_params()
    img_rng = np.random.default_rng(2025)
    gen_imgs = img_rng.integers(0, 256, (32, 32, 32, 3)).astype(np.float32)
    ref_imgs = img_rng.integers(0, 256, (32, 32, 32, 3)).astype(np.float32)
    batches = [
        jnp.asarray(gen_imgs[i * 16 : (i + 1) * 16] / 127.5 - 1.0, jnp.float32)
        for i in range(2)
    ]

    (m, s), (mu, sig) = fid_mod.combined_eval_from_sampler(
        lambda i: batches[i], 32, splits=2, params=params, variant="tf2015"
    )
    feats_ref = fid_mod.pool_features(ref_imgs, params=params, variant="tf2015")
    mu_r, sig_r = fid_mod.feature_statistics(feats_ref)
    f = fid_mod.frechet_distance(mu, sig, mu_r, sig_r)

    np.testing.assert_allclose(float(m), IS_MEAN, rtol=2e-4)
    np.testing.assert_allclose(float(s), IS_STD, rtol=5e-3)
    np.testing.assert_allclose(float(np.linalg.norm(mu)), MU_NORM, rtol=1e-4)
    np.testing.assert_allclose(
        float(np.trace(sig)), SIG_TRACE, rtol=2e-4
    )
    np.testing.assert_allclose(
        float(np.linalg.norm(mu_r)), REF_MU_NORM, rtol=1e-4
    )
    np.testing.assert_allclose(float(f), FID, rtol=1e-3)
