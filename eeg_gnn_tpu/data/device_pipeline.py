"""Fused on-device input pipeline (north-star "fused FFT-window dataloader").

The reference featurizes per sample on the host in DataLoader workers: FFT
per 1 s window, augmentation, standardization, 171 xcorr pairs + supports —
the CPU-bound hot loop (SURVEY.md §3.6 #2). Here hosts only read + slice
raw clips; everything else runs *inside the jitted train step* on device:

    raw (B, C, L) --> windows/FFT --> reflect+scale augment --> z-score
                   -> correlation Gram -> top-k -> random-walk supports
                      (or per-sample choice of the two distance-graph
                       support variants under reflection)

Parity notes (all verified against the host path in tests):
- augmentation order matches the reference: augment THEN standardize;
  scale is additive log on FFT features (dataloader_detection.py:233-256);
- the correlation graph is built from the UN-augmented features —
  reference dead-code quirk (graphs/xcorr.py);
- the distance graph under reflection uses the reference's quirky swapped
  adjacency, precomputed host-side as a second support variant;
- augmentation randomness comes from the step PRNG (statistically
  equivalent to the reference's np.random stream, not bit-identical).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from eeg_gnn_tpu.constants import FREQUENCY, get_swap_pairs
from eeg_gnn_tpu.graphs import (
    compute_supports,
    compute_supports_jnp,
    correlation_adjacency_jnp,
    load_distance_adjacency,
    swap_adjacency_nodes,
)


def reflection_permutation(num_nodes: int) -> np.ndarray:
    """Node permutation realizing the left-right electrode reflection."""
    perm = np.arange(num_nodes)
    for a, b in get_swap_pairs():
        perm[a], perm[b] = perm[b], perm[a]
    return perm


@dataclasses.dataclass(frozen=True)
class DevicePipeline:
    """Jit-friendly featurizer closure; build with :func:`make_device_pipeline`."""

    time_step_size: int
    use_fft: bool
    graph_type: str            # 'individual' | 'combined'
    filter_type: str
    top_k: Optional[int]
    mean: float
    std: float
    augment: bool
    node_perm: jnp.ndarray              # (N,) reflection permutation
    dist_supports: Optional[jnp.ndarray]         # (S, N, N) or None
    dist_supports_swapped: Optional[jnp.ndarray]  # (S, N, N) or None
    # Fast path for the combined graph: treat reflection as the TRUE node
    # relabeling. Reflecting BOTH the clip (x' = Px) and the distance graph
    # (A' = PAP^T) is a pure relabeling, and every consumer of this
    # pipeline (DCRNN family: per-node shared weights + node-symmetric
    # head/loss) is invariant under simultaneous node permutation —
    # supports commute with P for all filter types (degree/λmax/
    # normalizations are permutation-equivariant). Under that semantics the
    # reflected sample yields EXACTLY the unreflected loss and gradients
    # for a deterministic apply (tests/test_device_pipeline.py::
    # test_reflect_invariant_fast_path_exact proves it on the real model at
    # dropout=0; with dropout > 0 the per-position mask is not
    # permutation-equivariant, so the two are only distributionally
    # equivalent). Reflection is therefore skipped and
    # supports stay ONE shared (S, N, N) slab — the kernels'
    # shared-operator fast path — instead of per-clip (S, B, N, N) stacks.
    # DIVERGENCE (opt-in, default False): the reference's swapped adjacency
    # is NOT a true permutation (multi-pair writes clobber each other,
    # dataloader_detection.py:309-333 — see graphs/distance.py quirk note),
    # so this path deviates from the literal reference at those
    # intersection entries; see DIVERGENCES.md "Reflection-invariant
    # supports". Correlation ('individual') graphs are never invariant
    # (the reference builds the graph from the UN-reflected clip), so this
    # never applies there.
    reflect_invariant: bool = False

    def __call__(self, raw, rng, training: bool):
        """raw (B, C, L) float32 -> (x (B,T,C,D), supports (S,B,N,N))."""
        from eeg_gnn_tpu.ops.fft_features import featurize_clip

        feats = featurize_clip(raw, self.time_step_size, FREQUENCY,
                               self.use_fft)  # (B, T, C, D)
        return self.features(feats, rng, training)

    def features(self, feats, rng, training: bool, graph_feats=None):
        """Post-featurization tail: augment -> standardize -> supports.

        Entry point for ALREADY-featurized (B, T, C, D) clips — the
        HBM-resident dataset cache (data/device_cache.py) gathers stored
        FFT features and runs exactly the host path's remaining math
        (augment THEN standardize, dataloader_detection.py:233-256)
        on device. ``graph_feats`` overrides the tensor the correlation
        graph is built from (classification_features passes the
        length-masked clip so xcorr never sees padding).
        """
        b = feats.shape[0]

        do_aug = self.augment and training
        combined = self.graph_type != "individual"
        # see reflect_invariant: for the combined graph, (Px, PAP^T) is a
        # relabeling of (x, A) — skipping BOTH reflections reproduces the
        # reference's loss/gradients exactly while keeping supports shared
        do_reflect = do_aug and not (combined and self.reflect_invariant)
        if do_aug:
            k_ref, k_scale = jax.random.split(rng)
            reflect = jax.random.bernoulli(k_ref, 0.5, (b,))
            if do_reflect:
                reflected = feats[:, :, self.node_perm, :]
                aug = jnp.where(reflect[:, None, None, None], reflected,
                                feats)
            else:
                aug = feats
            scale = jax.random.uniform(k_scale, (b,), minval=0.8, maxval=1.2)
            if self.use_fft:
                aug = aug + jnp.log(scale).astype(aug.dtype)[
                    :, None, None, None]
            else:
                aug = aug * scale.astype(aug.dtype)[:, None, None, None]
        else:
            reflect = jnp.zeros((b,), bool)
            aug = feats

        x = (aug - jnp.asarray(self.mean, aug.dtype)) / jnp.asarray(
            self.std, aug.dtype)

        if self.graph_type == "individual":
            # reference quirk: graph from the UN-augmented features
            # (top-k tie-breaks want full precision — upcast bf16 storage)
            gfeats = feats if graph_feats is None else graph_feats
            adj = correlation_adjacency_jnp(gfeats.astype(jnp.float32),
                                            top_k=self.top_k)
            supports = compute_supports_jnp(adj, self.filter_type)
        elif do_reflect:
            supports = jnp.where(
                reflect[None, :, None, None],
                self.dist_supports_swapped[:, None],
                self.dist_supports[:, None],
            )  # (S, B, N, N)
        else:
            supports = self.dist_supports  # shared (S, N, N) slab
        return x, supports

    def classification_features(self, feats, seq_lengths, rng,
                                training: bool, padding_val: float = 0.0):
        """Classification tail for ALREADY-featurized PADDED (B, T, C, D)
        clips (data/device_cache.py): run the standard tail, then re-pin
        rows t >= seq_len to ``padding_val`` — the host path pads AFTER
        augment+standardize (dataloader_classification.py:334-352), so the
        padding region must not pick up the additive scale or the z-score
        shift.

        Correlation ('individual') graphs use the LENGTH-MASKED clip
        (rows t >= seq_len zeroed): zero rows contribute nothing to the
        Gram dot products or the per-channel energies, so the result is
        EXACTLY the reference's unpadded whole-clip xcorr
        (dataloader_classification.py:258-307) for every true length —
        the explicit mask additionally makes this independent of the
        cache's padding value. Parity vs the host oracle is gated in
        tests/test_device_pipeline.py."""
        t = feats.shape[1]
        row_mask = jnp.arange(t)[None, :] < seq_lengths[:, None]  # (B, T)
        graph_feats = None
        if self.graph_type == "individual":
            graph_feats = jnp.where(row_mask[:, :, None, None], feats,
                                    jnp.zeros((), feats.dtype))
        x, supports = self.features(feats, rng, training,
                                    graph_feats=graph_feats)
        x = jnp.where(row_mask[:, :, None, None], x,
                      jnp.asarray(padding_val, x.dtype))
        return x, supports

    def ssl(self, raw_x, raw_y, rng, training: bool):
        """SSL pair featurization: (raw_x (B,C,Lx), raw_y (B,C,Ly)) ->
        (x, y, supports).

        Parity with the host SSL path (dataloader_ssl.py:315-349): the
        SAME reflect decision and scale factor apply to x and y; the graph
        comes from the un-augmented x features.
        """
        from eeg_gnn_tpu.ops.fft_features import featurize_clip

        fx = featurize_clip(raw_x, self.time_step_size, FREQUENCY, self.use_fft)
        fy = featurize_clip(raw_y, self.time_step_size, FREQUENCY, self.use_fft)
        return self.ssl_features(fx, fy, rng, training)

    def ssl_features(self, fx, fy, rng, training: bool):
        """SSL tail for ALREADY-featurized (B, T, C, D) x/y pairs — entry
        point for the HBM-resident SSL cache (data/device_cache.py). One
        reflect decision + scale factor applies to BOTH clips; the graph
        comes from the un-augmented x features (dataloader_ssl.py:315-349).
        """
        b = fx.shape[0]

        do_aug = self.augment and training
        combined = self.graph_type != "individual"
        # same fast path as features(): for the combined graph under
        # reflect_invariant, the joint reflection of (x, y, A) is a pure
        # node relabeling, so it is skipped and supports stay shared
        do_reflect = do_aug and not (combined and self.reflect_invariant)
        if do_aug:
            k_ref, k_scale = jax.random.split(rng)
            reflect = jax.random.bernoulli(k_ref, 0.5, (b,))
            scale = jax.random.uniform(k_scale, (b,), minval=0.8, maxval=1.2)

            def aug(f):
                if do_reflect:
                    refl = f[:, :, self.node_perm, :]
                    out = jnp.where(reflect[:, None, None, None], refl, f)
                else:
                    out = f
                if self.use_fft:
                    return out + jnp.log(scale).astype(f.dtype)[
                        :, None, None, None]
                return out * scale.astype(f.dtype)[:, None, None, None]

            ax, ay = aug(fx), aug(fy)
        else:
            reflect = jnp.zeros((b,), bool)
            ax, ay = fx, fy

        x = (ax - jnp.asarray(self.mean, ax.dtype)) / jnp.asarray(
            self.std, ax.dtype)
        y = (ay - jnp.asarray(self.mean, ay.dtype)) / jnp.asarray(
            self.std, ay.dtype)

        if self.graph_type == "individual":
            # reference quirk: graph from the UN-augmented x features
            # (top-k tie-breaks want full precision — upcast bf16 storage)
            adj = correlation_adjacency_jnp(fx.astype(jnp.float32),
                                            top_k=self.top_k)
            supports = compute_supports_jnp(adj, self.filter_type)
        elif do_reflect:
            supports = jnp.where(
                reflect[None, :, None, None],
                self.dist_supports_swapped[:, None],
                self.dist_supports[:, None],
            )
        else:
            supports = self.dist_supports  # shared (S, N, N) slab
        return x, y, supports


def make_device_pipeline(*, graph_type: str, filter_type: str,
                         top_k: Optional[int], use_fft: bool,
                         time_step_size: int, scaler, augment: bool,
                         adj_mat_dir: Optional[str] = None,
                         num_nodes: int = 19,
                         reflect_invariant: bool = False
                         ) -> DevicePipeline:
    """``reflect_invariant=True`` opts into the shared-support fast path
    for the combined graph (reflection as a true node relabeling — exact
    no-op for the DCRNN family; see the DevicePipeline field docs). Default
    False reproduces the reference's literal per-clip swapped supports."""
    dist_sup = dist_sup_sw = None
    if graph_type == "combined":
        adj = load_distance_adjacency(adj_mat_dir)
        dist_sup = jnp.asarray(np.stack(compute_supports(adj, filter_type)))
        adj_sw = swap_adjacency_nodes(adj, get_swap_pairs())
        dist_sup_sw = jnp.asarray(
            np.stack(compute_supports(adj_sw, filter_type)))
    return DevicePipeline(
        time_step_size=time_step_size,
        use_fft=use_fft,
        graph_type=graph_type,
        filter_type=filter_type,
        top_k=top_k,
        mean=float(scaler.mean) if scaler is not None else 0.0,
        std=float(scaler.std) if scaler is not None else 1.0,
        augment=augment,
        node_perm=jnp.asarray(reflection_permutation(num_nodes)),
        dist_supports=dist_sup,
        dist_supports_swapped=dist_sup_sw,
        reflect_invariant=reflect_invariant,
    )
