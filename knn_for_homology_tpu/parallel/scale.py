"""Scale-out: pod meshes (ICI × DCN) and the sharded HBM-resident index.

The reference tops out at one CPU's RAM (a single FAISS object,
SURVEY.md §2). Here UniRef90-scale is the design point:

  * `make_pod_mesh` — a 2-level mesh whose inner axis rides ICI (within a
    slice) and outer axis DCN (across slices); database shards map to the
    combined data axis so the O(k·Q) winner-set merge crosses DCN exactly
    once while the heavy per-shard scan stays chip-local.
  * `ShardedFlatIndex` — exact flat search over a database sharded across
    every chip's HBM: streaming `add()` of host chunks, one placement at
    `finalize()`, queries fan out replicated and the per-shard top-k merges
    over the mesh. Shards spill to / reload from per-shard npz files for
    datasets larger than host RAM.
"""

from pathlib import Path
from typing import Iterable, List, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.distance import l2_normalize
from .mesh import DATA_AXIS
from .sharded import db_sharded_topk

DCN_AXIS = "dcn"


def data_axis_size(mesh: Mesh) -> int:
    """Total database shards of a (possibly dcn×data) mesh."""
    size = mesh.shape[DATA_AXIS]
    if DCN_AXIS in mesh.shape:
        size *= mesh.shape[DCN_AXIS]
    return size


def flatten_mesh(mesh: Mesh) -> Mesh:
    """Collapse a (dcn, data) pod mesh into one data axis (same device
    order) for shard_maps that merge over a single axis."""
    if DCN_AXIS not in mesh.shape:
        return mesh
    return Mesh(mesh.devices.reshape(-1), (DATA_AXIS,))


def make_pod_mesh(
    n_ici: Optional[int] = None, n_dcn: int = 1
) -> Mesh:
    """(dcn, data) mesh: inner contiguous devices per slice (ICI), outer
    across slices (DCN). With one slice this degrades to a flat data mesh."""
    devices = np.asarray(jax.devices())
    n_ici = n_ici or (len(devices) // n_dcn)
    devices = devices[: n_ici * n_dcn].reshape(n_dcn, n_ici)
    return Mesh(devices, (DCN_AXIS, DATA_AXIS))


class ShardedFlatIndex:
    """Exact cosine/ip/l2 index sharded over a mesh's data axis."""

    def __init__(
        self,
        mesh: Mesh,
        metric: str = "cosine",
        dtype=np.float32,
        storage: str = "native",  # "sq8"/"sq8-sym": int8 shard scans
    ):
        self.mesh = mesh
        self.metric = metric
        self.dtype = dtype
        self.storage = storage
        self._chunks: List[np.ndarray] = []
        self._db = None  # device array after finalize()
        self._n = 0

    @property
    def ntotal(self) -> int:
        return self._n

    def add(self, vectors: np.ndarray) -> "ShardedFlatIndex":
        """Stream in a host chunk (normalised once here for cosine)."""
        chunk = np.asarray(vectors, dtype=np.float32)
        if self.metric == "cosine":
            chunk = np.asarray(l2_normalize(chunk))
        self._chunks.append(chunk.astype(self.dtype))
        self._n += chunk.shape[0]
        self._db = None
        return self

    def _data_axis_size(self) -> int:
        return data_axis_size(self.mesh)

    def finalize(self) -> "ShardedFlatIndex":
        """Concatenate chunks, pad to the axis size, and place the shards
        into per-chip HBM in one device_put."""
        if not self._chunks:
            raise ValueError("index is empty; call add() first")
        db = np.concatenate(self._chunks, axis=0)
        n_shards = self._data_axis_size()
        pad = (-db.shape[0]) % n_shards
        if pad:
            db = np.pad(db, ((0, pad), (0, 0)))
        axes = (
            (DCN_AXIS, DATA_AXIS)
            if DCN_AXIS in self.mesh.shape
            else (DATA_AXIS,)
        )
        self._db = jax.device_put(
            db, NamedSharding(self.mesh, P(axes, None))
        )
        # keep the host chunks: add() after finalize() must not lose rows
        return self

    def search(
        self, queries: np.ndarray, k: int
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Replicated-query fan-out + per-shard top-k + mesh merge.
        Returns FAISS-convention (scores, ids)."""
        if self._db is None:
            self.finalize()
        import jax.numpy as jnp

        from ..ops.distance import finalize_scores

        q = jnp.asarray(np.asarray(queries, dtype=np.float32))
        if self.metric == "cosine":
            q = l2_normalize(q)
        search_metric = "ip" if self.metric == "cosine" else self.metric
        flat_mesh = self._flat_mesh()
        sims, ids = db_sharded_topk(
            self._db.astype(jnp.float32),
            q,
            k,  # k > ntotal pads FAISS-style inside db_sharded_topk
            flat_mesh,
            metric=search_metric,
            n_valid=self.ntotal,  # _db arrives pre-padded from finalize()
            approx=self.storage != "native",
            storage=self.storage,
        )
        return np.asarray(finalize_scores(sims, search_metric)), np.asarray(ids)

    def _flat_mesh(self) -> Mesh:
        return flatten_mesh(self.mesh)

    # --- shard spill -------------------------------------------------------
    def save_shards(self, directory: Path) -> None:
        directory = Path(directory)
        directory.mkdir(parents=True, exist_ok=True)
        db = np.concatenate(
            [np.asarray(c) for c in self._chunks], axis=0
        ) if self._db is None else np.asarray(self._db)[: self.ntotal]
        n_shards = self._data_axis_size()
        bounds = np.linspace(0, db.shape[0], n_shards + 1, dtype=int)
        for i in range(n_shards):
            np.savez_compressed(
                directory / f"shard_{i:04d}.npz",
                vectors=db[bounds[i] : bounds[i + 1]],
                metric=self.metric,
            )

    @classmethod
    def load_shards(
        cls, directory: Path, mesh: Mesh, metric: Optional[str] = None
    ) -> "ShardedFlatIndex":
        files = sorted(Path(directory).glob("shard_*.npz"))
        if not files:
            raise FileNotFoundError(f"no shards in {directory}")
        first = np.load(files[0])
        index = cls(mesh, metric or str(first["metric"]))
        for f in files:
            with np.load(f) as data:
                # shards were normalised before spilling; add raw
                chunk = data["vectors"]
                index._chunks.append(chunk.astype(index.dtype))
                index._n += chunk.shape[0]
        return index.finalize()


def stream_add(
    index: ShardedFlatIndex, chunks: Iterable[np.ndarray]
) -> ShardedFlatIndex:
    """Convenience: add an iterator of host chunks then finalize."""
    for chunk in chunks:
        index.add(chunk)
    return index.finalize()


class ShardedLSHIndex:
    """LSH sharded over the mesh's data axis — closes the index-family
    asymmetry (flat/graph/IVF all ride the pod mesh; LSH is the
    cheapest-memory index, reference single-node usage:
    pfam/proteins_search.py:26-27, 2048-bit IndexLSH on the full-protein
    corpus). The ±1 sign sketches live as int8 shards in per-chip HBM
    (nbits/8 bytes per row once bit-packed for spill; nbits bytes resident
    for the MXU), queries sketch once against the replicated projection,
    every chip runs the Hamming top-k over its shard as one int8 MXU
    matmul (ops/lsh.py: H = (nbits − s_q·s_db)/2), and the per-shard
    winner sets merge over ICI with one top-k.

    Hamming distances are exact small integers and both the shard-local
    streaming selection and the merge break ties by ascending global id,
    so results are BIT-identical to the single-chip LSHIndex — asserted on
    the 8-device mesh in tests/test_scale.py.
    """

    def __init__(self, mesh: Mesh, dim: int, nbits: int = 1024,
                 seed: int = 1234):
        from ..ops.lsh import projection_matrix

        self.mesh = mesh
        self.dim = dim
        self.nbits = nbits
        self.seed = seed
        self.projection = projection_matrix(dim, nbits, seed)
        self._chunks: List[np.ndarray] = []  # host int8 sign chunks
        self._signs = None  # device [N_pad, nbits] int8, data-sharded
        self._n = 0

    @property
    def ntotal(self) -> int:
        return self._n

    def add(self, vectors: np.ndarray) -> "ShardedLSHIndex":
        """Sketch a host chunk (one device matmul) and stream it in."""
        import jax.numpy as jnp

        from ..ops.lsh import compute_signs

        signs = np.asarray(
            compute_signs(
                jnp.asarray(np.asarray(vectors, dtype=np.float32)),
                jnp.asarray(self.projection),
            )
        )
        self._chunks.append(signs)
        self._n += signs.shape[0]
        self._signs = None
        return self

    def finalize(self) -> "ShardedLSHIndex":
        if not self._chunks:
            raise ValueError("index is empty; call add() first")
        signs = np.concatenate(self._chunks, axis=0)
        n_shards = data_axis_size(self.mesh)
        pad = (-signs.shape[0]) % n_shards
        if pad:
            # zero pad rows are masked by n_valid inside the shard-local
            # selection (they could otherwise win: Hamming nbits/2 beats
            # any sketch farther than half the bits)
            signs = np.pad(signs, ((0, pad), (0, 0)))
        flat = flatten_mesh(self.mesh)
        self._signs = jax.device_put(
            signs, NamedSharding(flat, P(DATA_AXIS, None))
        )
        return self

    def search(
        self, queries: np.ndarray, k: int
    ) -> Tuple[np.ndarray, np.ndarray]:
        """(hamming [Q, k] float32 ascending, global ids [Q, k]) — the
        single-chip LSHIndex's FAISS conventions, bit-identical."""
        import jax.numpy as jnp
        from jax import shard_map

        from ..ops.lsh import _sign_ip, compute_signs
        from ..ops.topk import streaming_topk

        if self._signs is None:
            self.finalize()
        q_signs = compute_signs(
            jnp.asarray(np.asarray(queries, dtype=np.float32)),
            jnp.asarray(self.projection),
        )
        n = self._n
        rows = self._signs.shape[0] // data_axis_size(self.mesh)
        k_local = min(k, rows)

        def local(signs_shard, q):
            shard_idx = jax.lax.axis_index(DATA_AXIS)
            row0 = shard_idx * rows
            n_local = jnp.clip(n - row0, 0, rows)
            vals, ids = streaming_topk(
                signs_shard, q, k_local, metric="ip",
                db_tile=min(8192, rows), n_valid=n_local, sim_fn=_sign_ip,
            )
            gids = jnp.where(ids >= 0, ids + row0, -1)
            valid = (gids >= 0) & (gids < n)
            vals = jnp.where(valid, vals, -jnp.inf)
            gids = jnp.where(valid, gids, -1)
            all_vals = jax.lax.all_gather(vals, DATA_AXIS, axis=0)
            all_ids = jax.lax.all_gather(gids, DATA_AXIS, axis=0)
            cand_vals = jnp.swapaxes(all_vals, 0, 1).reshape(q.shape[0], -1)
            cand_ids = jnp.swapaxes(all_ids, 0, 1).reshape(q.shape[0], -1)
            m_vals, sel = jax.lax.top_k(
                cand_vals, min(k, cand_vals.shape[1])
            )
            return m_vals, jnp.take_along_axis(cand_ids, sel, axis=1)

        flat_mesh = flatten_mesh(self.mesh)
        vals, ids = shard_map(
            local,
            mesh=flat_mesh,
            in_specs=(P(DATA_AXIS, None), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )(self._signs, q_signs)
        vals, ids = np.asarray(vals), np.asarray(ids)
        hamming = np.where(ids >= 0, (self.nbits - vals) * 0.5, np.inf)
        if hamming.shape[1] < k:  # k exceeded the database: FAISS padding
            pad = k - hamming.shape[1]
            hamming = np.pad(
                hamming, ((0, 0), (0, pad)), constant_values=np.inf
            )
            ids = np.pad(ids, ((0, 0), (0, pad)), constant_values=-1)
        return hamming.astype(np.float32), ids


class ShardedGraphIndex:
    """Graph ANN sharded over the mesh: one neighbour graph per shard
    (embarrassingly parallel builds), queries fan out replicated, every chip
    runs the batched beam search on its shard, and the per-shard winner sets
    merge over ICI with one top-k — sub-linear per-chip work at UniRef90
    scale where even the sharded exact scan gets expensive.

    Graph builds happen shard-locally (exact ≤256k rows, kNN-descent above,
    like GraphIndex), so index construction cost is O((N/S)² · d) per chip
    instead of O(N²·d).
    """

    def __init__(
        self,
        mesh: Mesh,
        metric: str = "cosine",
        degree: int = 42,
        beam_width: int = 128,
        expand: int = 8,
        n_entry: int = 32,
        n_pivots: int = 16384,  # dense per-shard pivot routing (see
        # search/graph.py GraphIndex: one skinny MXU matmul replaces graph
        # hops for global navigation; 0 → shared strided entries)
    ):
        self.mesh = mesh
        self.metric = metric
        self.degree = degree
        self.beam_width = beam_width
        self.expand = expand
        self.n_entry = n_entry
        self.n_pivots = n_pivots
        self._db = None  # [S, rows, d]
        self._graphs = None  # [S, rows, degree]
        self._n = 0

    @property
    def ntotal(self) -> int:
        return self._n

    def build(self, vectors: np.ndarray) -> "ShardedGraphIndex":
        from ..search.graph import GraphIndex

        v = np.asarray(vectors, dtype=np.float32)
        if self.metric == "cosine":
            v = np.asarray(l2_normalize(v))
        self._n = v.shape[0]
        n_shards = data_axis_size(self.mesh)
        pad = (-self._n) % n_shards
        if pad:
            # pad with wrapped REAL rows, not zeros: zero vectors would
            # occupy adjacency slots in the last shard's graph (cosine 0.0
            # beats negative sims) and degrade its connectivity; wrapped
            # rows are legitimate graph nodes and n_valid keeps them out of
            # the results
            v = np.pad(v, ((0, pad), (0, 0)), mode="wrap")
        rows = v.shape[0] // n_shards
        dbs, graphs = [], []
        for s in range(n_shards):
            shard = v[s * rows : (s + 1) * rows]
            local = GraphIndex(
                metric="ip" if self.metric == "cosine" else self.metric,
                degree=self.degree,
                beam_width=self.beam_width,
                expand=self.expand,
                n_entry=self.n_entry,
            ).add(shard)
            dbs.append(np.asarray(local._db))
            graphs.append(np.asarray(local._graph))
        flat = self._flat_mesh()
        self._db = jax.device_put(
            np.stack(dbs), NamedSharding(flat, P(DATA_AXIS, None, None))
        )
        self._graphs = jax.device_put(
            np.stack(graphs),
            NamedSharding(flat, P(DATA_AXIS, None, None)),
        )
        return self

    def _flat_mesh(self) -> Mesh:
        return flatten_mesh(self.mesh)

    def search(
        self, queries: np.ndarray, k: int
    ) -> Tuple[np.ndarray, np.ndarray]:
        """(scores [Q, k], global ids [Q, k]) — FAISS conventions."""
        import functools

        import jax.numpy as jnp
        from jax import shard_map

        from ..ops.distance import finalize_scores
        from ..search.graph import beam_search

        q = jnp.asarray(np.asarray(queries, dtype=np.float32))
        if self.metric == "cosine":
            q = l2_normalize(q)
        search_metric = "ip" if self.metric == "cosine" else self.metric
        rows = self._db.shape[1]
        k_local = min(k, rows)
        n = self._n
        n_piv = min(self.n_pivots, rows) if self.n_pivots > 0 else 0
        entry = jnp.arange(
            0, rows, max(rows // max(self.n_entry, 1), 1), dtype=jnp.int32
        )[: self.n_entry]
        pivots = jnp.arange(
            0, rows, max(rows // max(n_piv, 1), 1), dtype=jnp.int32
        )[:n_piv]
        beam = max(self.beam_width, k_local)
        iters = max(8, beam // max(self.expand, 1) // 2)

        def local(db_s, graph_s, q_rep):
            shard_idx = jax.lax.axis_index(DATA_AXIS)
            # this shard's pad rows must lose inside the beam itself
            n_local = jnp.clip(n - shard_idx * rows, 0, rows)
            if n_piv > 0:
                # per-query entries from this shard's dense pivot routing
                # (search/graph.py:_seed_entries, with the shard's pad rows
                # masked via n_valid)
                from ..search.graph import _seed_entries

                # fp32 shard passed as-is; _seed_entries casts the gathered
                # pivot rows only (keeps the transient at n_pivots*d)
                entries = _seed_entries(
                    db_s[0], pivots, q_rep,
                    self.n_entry, search_metric, n_valid=n_local,
                )
            else:
                entries = entry
            sims, ids = beam_search(
                db_s[0], graph_s[0], q_rep, entries, k_local,
                beam_width=beam, expand=self.expand, iters=iters,
                metric=search_metric, n_valid=n_local,
            )
            gids = jnp.where(ids >= 0, ids + shard_idx * rows, -1)
            valid = (gids >= 0) & (gids < n)
            sims = jnp.where(valid, sims, -jnp.inf)
            gids = jnp.where(valid, gids, -1)
            all_sims = jax.lax.all_gather(sims, DATA_AXIS, axis=0)
            all_ids = jax.lax.all_gather(gids, DATA_AXIS, axis=0)
            cand_sims = jnp.swapaxes(all_sims, 0, 1).reshape(q_rep.shape[0], -1)
            cand_ids = jnp.swapaxes(all_ids, 0, 1).reshape(q_rep.shape[0], -1)
            vals, sel = jax.lax.top_k(cand_sims, min(k, cand_sims.shape[1]))
            return vals, jnp.take_along_axis(cand_ids, sel, axis=1)

        flat_mesh = self._flat_mesh()
        sims, ids = shard_map(
            local,
            mesh=flat_mesh,
            in_specs=(P(DATA_AXIS, None, None), P(DATA_AXIS, None, None), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )(self._db, self._graphs, q)
        sims, ids = np.asarray(sims), np.asarray(ids)
        if sims.shape[1] < k:  # k exceeded the database: FAISS-style padding
            pad = k - sims.shape[1]
            sims = np.pad(sims, ((0, 0), (0, pad)), constant_values=-np.inf)
            ids = np.pad(ids, ((0, 0), (0, pad)), constant_values=-1)
        sims = np.asarray(finalize_scores(jnp.asarray(sims), search_metric))
        return sims, ids


class ShardedIVFIndex:
    """IVF sharded over the mesh's data axis — the third distributed index
    next to ShardedFlatIndex and ShardedGraphIndex: one inverted file per
    shard (embarrassingly parallel k-means + slab builds), queries fan
    out replicated, each chip routes against its own centroids and scans
    the probed int8 cluster slabs with the DMA kernel
    (ops/graph_pallas.beam_expand), and the per-shard winner sets merge
    over ICI with one top-k. Sub-linear per-chip work at pod scale with
    HALF the flat path's per-chip HBM (int8 slabs + scales).

    `rescore=True` (default — quality parity with the single-chip
    IVFIndex) keeps a sharded fp32 copy of the rows and exactly rescores
    each shard's shortlist before the merge: int8 slab scores carry
    ~0.4%-of-row-norm noise that scrambles near-tie neighbours (tight
    clusters). `rescore=False` drops the fp32 copy for the memory-lean
    mode; the shortlist is then re-scored in fp32 against the
    DEQUANTISED slabs (search/ivf.py:_slab_rescore_rows) — only the
    ~0.07% storage quantisation error stays caller-visible, like
    IVFIndex(store_fp32=False).
    """

    def __init__(
        self,
        mesh: Mesh,
        metric: str = "cosine",
        nprobe: int = 16,
        n_clusters: int = 0,  # 0 → per-shard auto (2·rows/128)
        kmeans_iters: int = 16,
        rescore: bool = True,
        union_budget: int = 0,
    ):
        self.mesh = mesh
        self.metric = metric
        self.nprobe = nprobe
        self.n_clusters = n_clusters
        self.kmeans_iters = kmeans_iters
        self.rescore = rescore
        # > 0: per-shard FIXED-budget union scan (search/ivf.py
        # _union_scan_one — gather the block's most-probed cells' slabs
        # once and scan at the flat engine's rate) instead of per-query
        # DMA expansion. Static budget keeps the whole shard program
        # traced (no host sync inside shard_map); cells beyond the budget
        # are the block's least-probed — recall decays gracefully.
        self.union_budget = max(0, union_budget)  # <=0 = DMA path
        self._n = 0
        self._rows = 0  # db rows per shard (global-id offset unit)
        self._cent = None  # [S, C, d] f32
        self._pv = None  # [S, C*cap, d] int8
        self._pi = None  # [S, C, cap] int32
        self._sc = None  # [S, C, cap] f32
        self._row_sq = None  # [S, C, cap] f32 (l2 only)
        self._dbv = None  # [S, rows, d] f32 (rescore=True only)
        self._slot = None  # [S, rows] int32: local id -> packed row

    @property
    def ntotal(self) -> int:
        return self._n

    def build(self, vectors: np.ndarray) -> "ShardedIVFIndex":
        from ..search.ivf import IVFIndex

        v = np.asarray(vectors, dtype=np.float32)
        if self.metric == "cosine":
            v = np.asarray(l2_normalize(v))
        self._n = v.shape[0]
        n_shards = data_axis_size(self.mesh)
        pad = (-self._n) % n_shards
        if pad:
            # wrapped REAL rows, not zeros (zeros would routinely win the
            # routing for far-out queries); n_valid keeps them out of the
            # results
            v = np.pad(v, ((0, pad), (0, 0)), mode="wrap")
        rows = v.shape[0] // n_shards
        self._rows = rows  # global id = local id + shard_idx * rows
        search_metric = "ip" if self.metric == "cosine" else self.metric
        cents, pvs, pis, scs, rsqs, slots = [], [], [], [], [], []
        for s in range(n_shards):
            local = IVFIndex(
                metric=search_metric,
                nprobe=self.nprobe,
                n_clusters=self.n_clusters,
                kmeans_iters=self.kmeans_iters,
            ).add(v[s * rows : (s + 1) * rows])
            cents.append(np.asarray(local._centroids))
            pv, pi, sc = local._packed
            pvs.append(np.asarray(pv))
            pis.append(np.asarray(pi))
            scs.append(np.asarray(sc))
            # local id -> packed row, for the lean slab rescore
            flat_ids = np.asarray(pi).reshape(-1)
            slot = np.zeros((rows,), np.int32)
            valid = flat_ids >= 0
            slot[flat_ids[valid]] = np.arange(
                flat_ids.shape[0], dtype=np.int32
            )[valid]
            slots.append(slot)
            if search_metric == "l2":
                rsqs.append(np.asarray(local._row_sq))
            del local
        flat = flatten_mesh(self.mesh)
        sh3 = NamedSharding(flat, P(DATA_AXIS, None, None))
        self._cent = jax.device_put(np.stack(cents), sh3)
        self._pv = jax.device_put(np.stack(pvs), sh3)
        self._pi = jax.device_put(np.stack(pis), sh3)
        self._sc = jax.device_put(np.stack(scs), sh3)
        self._slot = jax.device_put(
            np.stack(slots), NamedSharding(flat, P(DATA_AXIS, None))
        )
        if rsqs:
            self._row_sq = jax.device_put(np.stack(rsqs), sh3)
        if self.rescore:
            self._dbv = jax.device_put(
                v.reshape(n_shards, rows, -1), sh3
            )
        return self

    def search(
        self, queries: np.ndarray, k: int
    ) -> Tuple[np.ndarray, np.ndarray]:
        """(scores [Q, k], global ids [Q, k]) — FAISS conventions."""
        import jax.numpy as jnp
        from jax import shard_map

        from ..ops import graph_pallas as gp
        from ..ops.distance import finalize_scores
        from ..search.ivf import CAPACITY, IVFIndex, _route_sims

        q = jnp.asarray(np.asarray(queries, dtype=np.float32))
        if self.metric == "cosine":
            q = l2_normalize(q)
        search_metric = "ip" if self.metric == "cosine" else self.metric
        n = self._n
        rows = self._rows
        c_local = self._cent.shape[1]
        k_eff = min(k, rows, n)
        nprobe = min(
            max(self.nprobe, -(-2 * k_eff // CAPACITY)), c_local
        )
        interpret = jax.default_backend() != "tpu"
        chunk = IVFIndex.MAX_PROBE_PER_CALL

        rescore_mode = "db" if self.rescore else "slab"

        def local_union(cent, pv, pi, sc, rsq, db, slot, q_rep):
            """Per-shard fixed-budget union scan (vals, local ids)."""
            from ..search.ivf import _union_scan_one

            budget = min(self.union_budget, c_local)
            shortlist = min(max(4 * k_eff, CAPACITY), nprobe * CAPACITY)
            d = q_rep.shape[1]
            qb = min(IVFIndex.QUERY_BLOCK, q_rep.shape[0])
            # same rescore-gather transient cap as the single-chip path
            # (ivf.py): the rescore materialises [qb, shortlist, d] f32
            # per block in either mode
            while qb > 256 and qb * shortlist * d * 4 > 2e9:
                qb //= 2
            n_blocks = -(-q_rep.shape[0] // qb)
            pad = n_blocks * qb - q_rep.shape[0]
            q_pad = (
                jnp.concatenate(
                    [q_rep,
                     jnp.broadcast_to(q_rep[-1:], (pad, q_rep.shape[1]))]
                )
                if pad
                else q_rep
            )

            # one scan body compile, not n_blocks inlined program copies
            # (compile latency through the relay is the dominant cost)
            def body(_, q):
                return None, _union_scan_one(
                    q, cent, pv, pi, sc, rsq, db, slot,
                    metric=search_metric, k_eff=k_eff, nprobe=nprobe,
                    shortlist=shortlist, rescore=rescore_mode,
                    budget=budget,
                    int8_min_rows=IVFIndex.INT8_UNION_MIN_ROWS,
                    # same rule as IVFIndex.plan_blocks: lift query-side
                    # quantisation noise in the scan when no true-fp32
                    # rescore follows
                    compute="sym" if rescore_mode == "db" else "sym2",
                )

            _, (vals, ids) = jax.lax.scan(
                body, None, q_pad.reshape(n_blocks, qb, d)
            )
            vals = vals.reshape(n_blocks * qb, -1)[: q_rep.shape[0]]
            ids = ids.reshape(n_blocks * qb, -1)[: q_rep.shape[0]]
            return vals, ids

        def local(cent_s, pv_s, pi_s, sc_s, rsq_s, db_s, slot_s, q_rep):
            shard_idx = jax.lax.axis_index(DATA_AXIS)
            cent, pv, pi, sc = cent_s[0], pv_s[0], pi_s[0], sc_s[0]
            if self.union_budget:
                vals, ids = local_union(
                    cent, pv, pi, sc, rsq_s[0], db_s[0], slot_s[0], q_rep
                )
                return merge(vals, ids, shard_idx, q_rep)
            route = _route_sims(q_rep, cent, search_metric)
            _, sel = jax.lax.top_k(route, nprobe)
            q_sq = (
                jnp.sum(jnp.square(q_rep), axis=-1)
                if search_metric == "l2"
                else None
            )
            parts_s, parts_i = [], []
            for p0 in range(0, nprobe, chunk):
                sel_part = sel[:, p0 : p0 + chunk]
                s_part, i_part = gp.beam_expand(
                    sel_part, q_rep, pv, pi, sc, CAPACITY,
                    interpret=interpret,
                )
                if search_metric == "l2":
                    s_part = (
                        2.0 * s_part
                        - rsq_s[0][sel_part]
                        - q_sq[:, None, None]
                    )
                parts_s.append(s_part)
                parts_i.append(i_part)
            cand_s = jnp.concatenate(parts_s, axis=1).reshape(
                q_rep.shape[0], -1
            )
            cand_i = jnp.concatenate(parts_i, axis=1).reshape(
                q_rep.shape[0], -1
            )
            cand_s = jnp.where(cand_i >= 0, cand_s, -jnp.inf)
            short = min(max(4 * k_eff, 128), cand_s.shape[1])
            vals, pos = jax.lax.top_k(cand_s, short)
            ids = jnp.take_along_axis(cand_i, pos, axis=1)
            # fp32 rescore of the shortlist, then the true top-k (int8
            # near-tie scrambling fixed like the single IVFIndex): exact
            # rows when the fp32 copy exists, dequantised slab rows in
            # the lean mode
            safe = jnp.clip(ids, 0, rows - 1)
            if rescore_mode == "db":
                rows_f = db_s[0][safe]
            else:
                srows = slot_s[0][safe]
                # slabs are lane-padded at pack time; slice back to d
                rows_f = (
                    pv[srows][..., : q_rep.shape[1]].astype(jnp.float32)
                    * sc.reshape(-1)[srows][..., None]
                )
            ex = jnp.einsum(
                "qkd,qd->qk", rows_f, q_rep,
                preferred_element_type=jnp.float32,
            )
            if search_metric == "l2":
                r_sq = (
                    jnp.sum(jnp.square(rows_f), axis=-1)
                    if rescore_mode == "db"
                    # exact fp32 norms survive the lean build
                    else rsq_s[0].reshape(-1)[slot_s[0][safe]]
                )
                ex = 2.0 * ex - r_sq - q_sq[:, None]
            vals = jnp.where(ids >= 0, ex, -jnp.inf)
            vals, order = jax.lax.top_k(vals, min(k_eff, vals.shape[1]))
            ids = jnp.take_along_axis(ids, order, axis=1)
            return merge(vals, ids, shard_idx, q_rep)

        def merge(vals, ids, shard_idx, q_rep):
            """Shared epilogue: local→global ids, ICI winner merge."""
            gids = jnp.where(ids >= 0, ids + shard_idx * rows, -1)
            # wrapped pad rows carry local ids < rows but global ≥ n
            valid = (gids >= 0) & (gids < n)
            vals = jnp.where(valid, vals, -jnp.inf)
            gids = jnp.where(valid, gids, -1)
            all_sims = jax.lax.all_gather(vals, DATA_AXIS, axis=0)
            all_ids = jax.lax.all_gather(gids, DATA_AXIS, axis=0)
            cand_sims = jnp.swapaxes(all_sims, 0, 1).reshape(
                q_rep.shape[0], -1
            )
            cand_ids = jnp.swapaxes(all_ids, 0, 1).reshape(
                q_rep.shape[0], -1
            )
            m_vals, m_sel = jax.lax.top_k(
                cand_sims, min(k, cand_sims.shape[1])
            )
            return m_vals, jnp.take_along_axis(cand_ids, m_sel, axis=1)

        flat_mesh = flatten_mesh(self.mesh)
        rsq = (
            self._row_sq
            if self._row_sq is not None
            else jnp.zeros_like(self._sc)
        )
        dbv = (
            self._dbv
            if self._dbv is not None
            else jnp.zeros((self._cent.shape[0], 1, q.shape[1]), jnp.float32)
        )
        sims, ids = shard_map(
            local,
            mesh=flat_mesh,
            in_specs=(
                P(DATA_AXIS, None, None),
                P(DATA_AXIS, None, None),
                P(DATA_AXIS, None, None),
                P(DATA_AXIS, None, None),
                P(DATA_AXIS, None, None),
                P(DATA_AXIS, None, None),
                P(DATA_AXIS, None),
                P(),
            ),
            out_specs=(P(), P()),
            check_vma=False,
        )(self._cent, self._pv, self._pi, self._sc, rsq, dbv, self._slot, q)
        sims, ids = np.asarray(sims), np.asarray(ids)
        if sims.shape[1] < k:  # k exceeded the pool: FAISS-style padding
            pad = k - sims.shape[1]
            sims = np.pad(
                sims, ((0, 0), (0, pad)), constant_values=-np.inf
            )
            ids = np.pad(ids, ((0, 0), (0, pad)), constant_values=-1)
        sims = np.asarray(
            finalize_scores(jnp.asarray(sims), search_metric)
        )
        return sims, ids


class ShardSweep:
    """UniRef90-scale on ONE chip: shards stream through HBM sequentially.

    A pod holds one shard per chip (ShardedGraphIndex); with a single chip
    the same per-shard programs run back to back, spilling each built shard
    to disk and reloading it at query time — HBM never holds more than one
    shard. This is both the single-host big-data mode (UniRef90 = 66M
    proteins doesn't fit one HBM) and the rehearsal harness for pod scaling:
    per-shard build/query times are exactly what each pod chip would spend
    concurrently, and the host-side winner merge is the DCN merge.

    Reference scale anchor: the reference's UniRef90 case study ran MMseqs2
    on a 2×64-core server (SURVEY.md §6); its FAISS path never attempted it.

    `index="graph"` (default) spills per-shard GraphIndex shards (beam
    navigation); `index="ivf"` spills per-shard IVFIndex shards (the
    equal-memory sub-linear mode — k-means routing + int8 cluster slabs,
    union-scanned per query block).
    """

    def __init__(
        self,
        shard_dir: Path,
        metric: str = "cosine",
        degree: int = 42,
        beam_width: int = 128,
        expand: int = 8,
        iters: int = 8,
        k_local: Optional[int] = None,
        index: str = "graph",
        nprobe: int = 16,
        n_clusters: int = 0,
        kmeans_iters: int = 8,
        store_fp32: bool = False,
    ):
        if index not in ("graph", "ivf"):
            raise ValueError(f"unknown shard index type {index!r}")
        self.shard_dir = Path(shard_dir)
        self.shard_dir.mkdir(parents=True, exist_ok=True)
        self.metric = metric
        self.degree = degree
        self.beam_width = beam_width
        self.expand = expand
        self.iters = iters
        self.k_local = k_local
        self.index = index
        self.nprobe = nprobe
        self.n_clusters = n_clusters
        self.kmeans_iters = kmeans_iters
        # IVF shards default to the lean layout (int8 slabs only, no
        # fp32 rescore): the sweep's point is max rows per chip
        self.store_fp32 = store_fp32
        self._rows: List[int] = []

    @property
    def ntotal(self) -> int:
        return int(sum(self._rows))

    def _path(self, s: int) -> Path:
        return self.shard_dir / f"{self.index}_shard_{s:04d}.npz"

    def build_shard(self, vectors) -> float:
        """Build shard `len(self._rows)`'s index on device and spill it.
        Returns the build seconds (device work only; spill IO excluded)."""
        import time as _time

        from ..search.io import write_index

        s = len(self._rows)
        t0 = _time.perf_counter()
        if self.index == "ivf":
            from ..search.ivf import IVFIndex

            index = IVFIndex(
                metric=self.metric,
                nprobe=self.nprobe,
                n_clusters=self.n_clusters,
                kmeans_iters=self.kmeans_iters,
                store_fp32=self.store_fp32,
            ).add(vectors)
        else:
            from ..search.graph import GraphIndex

            index = GraphIndex(
                metric=self.metric,
                degree=self.degree,
                beam_width=self.beam_width,
                expand=self.expand,
                iters=self.iters,
            ).add(vectors)
        jax.block_until_ready(
            [x for x in jax.tree_util.tree_leaves(vars(index))
             if isinstance(x, jax.Array)]
        )
        seconds = _time.perf_counter() - t0
        write_index(index, self._path(s))
        self._rows.append(index.ntotal)
        return seconds

    def search(self, queries, k: int):
        """Sweep every spilled shard through HBM; merge winner sets on host.
        Returns (scores [Q, k], global ids [Q, k], per-shard device seconds).
        """
        import time as _time

        import jax.numpy as jnp

        from ..ops.distance import finalize_scores
        from ..search.io import read_index

        q = np.asarray(queries, dtype=np.float32)
        k_local = self.k_local or k
        all_sims, all_ids = [], []
        shard_seconds = []
        offset = 0
        for s in range(len(self._rows)):
            index = read_index(self._path(s))
            kl = min(k_local, index.ntotal)
            # sync the shard's lazy host->device transfer BEFORE the timer:
            # per-shard seconds must reflect the device pass a pod chip
            # would run concurrently, not this machine's load bandwidth
            jax.block_until_ready(
                [x for x in jax.tree_util.tree_leaves(vars(index))
                 if isinstance(x, jax.Array)]
            )
            # beam_search is a module-level jit: shard 0 pays the compile,
            # later shards hit the cache (report the median outside)
            t0 = _time.perf_counter()
            sims, ids = index.search(q, kl)
            shard_seconds.append(_time.perf_counter() - t0)
            # undo the per-shard FAISS finalisation so merge keys are the
            # internal bigger-is-better sims for every metric
            sims = np.asarray(sims)
            if self.metric == "l2":
                sims = -sims
            all_sims.append(sims)
            all_ids.append(np.where(ids >= 0, ids + offset, -1))
            offset += self._rows[s]
            del index  # free the shard's HBM before the next load
        cand_s = np.concatenate(all_sims, axis=1)
        cand_i = np.concatenate(all_ids, axis=1)
        cand_s = np.where(cand_i >= 0, cand_s, -np.inf)
        sel = np.argsort(-cand_s, axis=1, kind="stable")[:, :k]
        top_s = np.take_along_axis(cand_s, sel, axis=1)
        top_i = np.take_along_axis(cand_i, sel, axis=1)
        if top_s.shape[1] < k:
            pad = k - top_s.shape[1]
            top_s = np.pad(top_s, ((0, 0), (0, pad)), constant_values=-np.inf)
            top_i = np.pad(top_i, ((0, 0), (0, pad)), constant_values=-1)
        import jax.numpy as jnp

        metric = "ip" if self.metric == "cosine" else self.metric
        top_s = np.asarray(finalize_scores(jnp.asarray(top_s), metric))
        return top_s, top_i, shard_seconds
