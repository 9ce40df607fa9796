"""End-to-end validation battery on the real TPU.

Drives the library across its surface: APSP vs a scipy Dijkstra oracle,
hypergeometric sf vs scipy.stats, permutation-count sanity, and the full
facade pipeline on a synthetic geometric network. Prints VERIFY OK on success.

Usage: tools/tpu_run.sh tools/tpu_validate.py
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

print("devices:", jax.devices(), flush=True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import safepy_tpu
from safepy_tpu.ops import apsp as apsp_mod
from safepy_tpu.ops import hypergeom as hg
from safepy_tpu.ops import neighborhoods as nbr
from safepy_tpu.ops import permutation as perm

# 1. synthetic geometric graph
rng = np.random.default_rng(0)
n = 500
coords = rng.uniform(-1, 1, (n, 2))
from scipy.spatial import cKDTree
tree = cKDTree(coords)
_, nn = tree.query(coords, k=8)
edges = sorted({(min(i, int(j)), max(i, int(j))) for i in range(n) for j in nn[i, 1:]})
w = np.array([np.hypot(*(coords[a] - coords[b])) for a, b in edges])
d0 = nbr.dense_initial_distances(n, np.array(edges), w, dtype=np.float32)

# 2. APSP vs scipy
from scipy.sparse import coo_matrix
from scipy.sparse.csgraph import shortest_path
A = coo_matrix((w, tuple(np.array(edges).T)), shape=(n, n))
ref = shortest_path(A.maximum(A.T), method="D", directed=False)
t0 = time.time()
dist = np.asarray(apsp_mod(jnp.asarray(d0)))
print("APSP wall (incl compile):", round(time.time() - t0, 2), "s", flush=True)
finite = np.isfinite(ref)
err = np.abs(dist[finite] - ref[finite]).max()
print("APSP max err:", err, flush=True)
assert err < 1e-5

# 3. hypergeom vs scipy
from scipy.stats import hypergeom as sp_h
M, Kv = 400, 37
k = jnp.asarray(rng.integers(0, 30, (64, 16)).astype(np.float32))
Ka = jnp.asarray(np.full((1, 16), Kv, np.float32))
m = jnp.asarray(rng.integers(30, 200, (64, 1)).astype(np.float32))
iters = hg.tail_iterations(M, Kv)
p, nes = hg.hypergeom_sf_and_nes(k, M, Ka, m, iterations=iters)
ref_p = sp_h.sf(np.asarray(k) - 1, M, Kv, np.asarray(m))
perr = np.abs(np.asarray(p) - ref_p).max()
print("hypergeom p-err:", perr, flush=True)
assert perr < 1e-9

# 4. permutations
n2a = rng.normal(size=(n, 3)); n2a[rng.random(n) < 0.3, 0] = np.nan
nbr_ind = jnp.asarray((dist < 0.25).astype(np.float32))
valid = np.flatnonzero(np.sum(~np.isnan(n2a), axis=1))
from safepy_tpu.ops import score
obs = score.compute_neighborhood_score(nbr_ind, n2a, "sum", "highest")
t0 = time.time()
cn, cp = perm.run_permutations(nbr_ind, n2a, valid, obs, jax.random.PRNGKey(0),
                               score_type="sum", num_permutations=1000)
cn, cp = np.asarray(cn), np.asarray(cp)
print("1000 perms wall:", round(time.time() - t0, 2), "s", flush=True)
ok = ~np.isnan(np.asarray(obs))
assert ((cn + cp)[ok] >= 1000).all()
print("perm counts sane", flush=True)

# 5. facade end-to-end on txt + df
import pandas as pd, tempfile, os
tmp = tempfile.mkdtemp()
netf = os.path.join(tmp, "net.txt")
with open(netf, "w") as f:
    for a, b in edges:
        f.write(f"g{a}\tg{b}\t1.0\n")
attr = pd.DataFrame({"q": rng.normal(size=n)}, index=[f"g{i}" for i in range(n)])
sf = safepy_tpu.SAFE(verbose=False)
sf.random_seed = 11
sf.load_network(network_file=netf, node_key_attribute="key")
sf.load_attributes(attribute_file=attr)
t0 = time.time()
sf.run_pipeline(num_permutations=500)
print("facade e2e wall:", round(time.time() - t0, 2), "s; enriched:",
      int(sf.nes_binary.sum()), flush=True)
assert sf.nes.shape == (n, 1) and np.isfinite(sf.nes).any()

# 6. band-STORAGE engine vs the dense engine (forced at validation scale)
sf_band = safepy_tpu.SAFE(verbose=False)
sf_band.apsp_mode = "band"
sf_band.random_seed = 11
sf_band.load_network(network_file=netf, node_key_attribute="key")
sf_band.load_attributes(attribute_file=attr)
t0 = time.time()
sf_band.run_pipeline(num_permutations=500)
band_err = np.nanmax(np.abs(sf_band.ns - sf.ns))
print("band engine wall:", round(time.time() - t0, 2), "s; ns err:",
      band_err, flush=True)
assert np.array_equal(sf_band.neighborhoods, sf.neighborhoods)
assert band_err <= 1e-4
print("VERIFY OK", flush=True)
