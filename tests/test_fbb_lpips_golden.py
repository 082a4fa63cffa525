"""Golden end-to-end parity for the HEADLINE distance: the fbb attack under
l2 + 0.2*LPIPS must produce identical NN indices and matching losses vs a
torch re-enactment of the reference's custom_knn loop (``fbb.py:73-88`` +
``utils.py:153-177``) with shared backbone/lin weights."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from ganleaks_tpu.ops.distance import make_embed_fn
from ganleaks_tpu.ops.knn import knn_argmin_streamed
from ganleaks_tpu.ops.lpips import lpips_embed_fn
from tests.test_lpips import SCALE, SHIFT, make_shared_params


def torch_l2_lpips_oracle(torch_convs, lins, syn, queries, batch_size):
    """Loss.forward (l2-lpips) inside custom_knn, faithfully."""
    def tower(t):
        feats = []
        pool_after = {1, 3, 6, 9}
        taps = {1, 3, 6, 9, 12}
        h = (t - SHIFT) / SCALE
        for i, (w, b, s, p) in enumerate(torch_convs):
            h = F.relu(F.conv2d(h, w, b, stride=s, padding=p))
            if i in taps:
                feats.append(h)
            if i in pool_after:
                h = F.max_pool2d(h, 2, 2)
        return feats

    def normalize(f):
        return f / (torch.sqrt(torch.sum(f ** 2, dim=1, keepdim=True))
                    + 1e-10)

    def lpips(a, b):
        val = 0.0
        for fa, fb, w in zip(tower(a), tower(b), lins):
            diff = (normalize(fa) - normalize(fb)) ** 2
            lin = F.conv2d(diff, torch.from_numpy(w).view(1, -1, 1, 1))
            val = val + torch.mean(torch.mean(lin, dim=3), dim=2)
        return val.view(-1)

    syn_t = torch.from_numpy(syn.transpose(0, 3, 1, 2))
    out_d, out_i = [], []
    for q in queries:
        qt = torch.from_numpy(q.transpose(2, 0, 1))[None]
        dists = []
        for i in range(len(syn) // batch_size):
            xb = syn_t[i * batch_size:(i + 1) * batch_size]
            qb = qt.expand(len(xb), -1, -1, -1)
            l2 = torch.mean((qb - xb) ** 2, dim=[1, 2, 3])
            dists.append(0.2 * lpips(xb, qb) + l2)
        d = torch.cat(dists)
        mind, mini = torch.min(d, dim=0)
        out_d.append(mind.item())
        out_i.append(mini.item())
    return np.array(out_d), np.array(out_i)


def test_fbb_l2_lpips_golden_parity(rng):
    params, torch_convs, lins = make_shared_params(rng, "vgg")
    syn = rng.uniform(-1, 1, (24, 32, 32, 3)).astype(np.float32)
    queries = rng.uniform(-1, 1, (5, 32, 32, 3)).astype(np.float32)
    syn[17] = queries[2] * 0.98 + 0.01  # near-duplicate member signal

    with torch.no_grad():
        ref_d, ref_i = torch_l2_lpips_oracle(torch_convs, lins, syn,
                                             queries, batch_size=8)

    embed = make_embed_fn("l2-lpips", lpips_embed_fn(params, weight=0.2))
    d, i = knn_argmin_streamed(embed, jnp.asarray(queries),
                               jnp.asarray(syn), engine="gemm",
                               q_block=4, s_block=8)

    np.testing.assert_array_equal(np.asarray(i), ref_i)
    np.testing.assert_allclose(np.asarray(d), ref_d, rtol=1e-4, atol=1e-5)
    assert int(np.asarray(i)[2]) == 17
