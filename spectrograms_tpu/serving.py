"""Production feature-serving pipeline: decode → batch → device → features.

Composes the framework's pieces into the deployment shape the reference's
users build by hand around its batch loops (``README.md:298-364``):

- the C++ prefetching loader decodes and pads on worker threads
  (``runtime/loader.py``) while the chip computes the previous batch —
  JAX dispatch is async, so IO and compute overlap without any extra code;
- a compiled plan maps each fixed-shape batch in one device program;
- an optional device mesh shards the batch data-parallel (zero collectives);
- padding frames are masked out using the true lengths.

``FeaturePipeline`` is synchronous-iterator simple on purpose: throughput
comes from the loader threads + async dispatch, not from Python concurrency.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .errors import InvalidInputError
from .ops.framing import frame_count
from .runtime.loader import AudioBatchLoader

__all__ = ["FeatureBatch", "FeatureSetBatch", "FeaturePipeline"]


@dataclass
class FeatureBatch:
    """One served batch: features + per-item validity.

    ``frame_mask`` is host-resident numpy (it is derived from the host-side
    lengths): shipping it eagerly would add one serialized tunnel transfer
    per batch to every consumer, including the many that never mask.
    ``masked()`` (and any jnp op) uploads it on first use.
    """

    features: jax.Array        # (B, n_bins, n_frames)
    lengths: np.ndarray        # (B,) true sample counts (0 = padding row)
    frame_mask: np.ndarray     # (B, n_frames) True where the frame is real

    @property
    def batch_size(self) -> int:
        return self.features.shape[0]

    def masked(self) -> jax.Array:
        """Features with padding frames zeroed."""
        mask = jnp.asarray(self.frame_mask, dtype=self.features.dtype)
        return self.features * mask[:, None, :]


@dataclass
class FeatureSetBatch:
    """One served batch of a :class:`~spectrograms_tpu.FeatureSet`.

    ``features`` holds one array per member, in member order;
    ``frame_masks`` one host numpy mask per member (None for members
    whose frame geometry is unknown, e.g. bare callables).
    """

    features: Tuple[jax.Array, ...]
    lengths: np.ndarray
    frame_masks: Tuple[Optional[np.ndarray], ...]

    @property
    def batch_size(self) -> int:
        return self.features[0].shape[0]

    def masked(self) -> Tuple[jax.Array, ...]:
        """Per-member features with padding frames zeroed (members
        without a known frame geometry are returned unmasked)."""
        out = []
        for f, m in zip(self.features, self.frame_masks):
            if m is None:
                out.append(f)
            else:
                out.append(f * jnp.asarray(m, dtype=f.dtype)[:, None, :])
        return tuple(out)


def _plan_rate(m):
    """Sample rate of a plan, wherever its family keeps it (params,
    the plan itself, or an inner mel/magnitude plan)."""
    for obj in (
        getattr(m, "params", None),
        m,
        getattr(getattr(m, "_mel_plan", None), "params", None),
        getattr(getattr(m, "_mag_plan", None), "params", None),
    ):
        r = getattr(obj, "sample_rate_hz", None) or getattr(
            obj, "_sample_rate_hz", None
        )
        if r is not None:
            return float(r)
    return None


def _plan_stft(m):
    """STFT geometry of a plan, wherever its family keeps it:
    SpectrogramPlan subclasses carry params.stft, ChromaPlan a bare
    _stft_params, MfccPlan its inner mel plan."""
    st = getattr(getattr(m, "params", None), "stft", None)
    if st is None:
        st = getattr(m, "_stft_params", None)
    if st is None:
        inner = getattr(m, "_mel_plan", None)
        st = getattr(getattr(inner, "params", None), "stft", None)
    return st


class FeaturePipeline:
    """Stream WAV files through a plan at full device throughput.

    ``plan`` may also be a :class:`~spectrograms_tpu.FeatureSet`: the
    set's one fused program (shared decimation cascade included) runs
    per batch, so multi-feature serving decodes, quantizes and uploads
    the corpus ONCE; batches then arrive as :class:`FeatureSetBatch`
    with per-member features and frame masks.

    >>> plan = sg.MelDbPlan(params, mel, db, dtype="float32")
    >>> pipe = FeaturePipeline(plan, batch_size=32, target_seconds=10.0)
    >>> for batch in pipe.run(paths):
    ...     train_step(batch.masked())
    """

    def __init__(
        self,
        plan,
        batch_size: int,
        target_seconds: float,
        sample_rate_hz: Optional[float] = None,
        mesh: Optional[jax.sharding.Mesh] = None,
        data_axis: str = "data",
        n_threads: int = 4,
        prefetch_batches: int = 4,
        on_rate_mismatch: str = "error",
        autotune: bool = False,
        transport: str = "float32",
        pipeline_uploads: bool = False,
    ):
        self.plan = plan
        self.on_rate_mismatch = on_rate_mismatch
        # pipeline_uploads=True enqueues batch k's host→device transfer
        # BEFORE blocking on batch k−1's (two loader slots held,
        # iter_borrowed(hold=2)) — the right discipline when transfers DMA
        # concurrently with compute (locally-attached devices). Measured
        # NEGATIVE on a network-tunnel-attached chip (this rig): transfers
        # serialize, so there is nothing to overlap, and a second in-flight
        # transfer intermittently trips the tunnel's queue-drag mode
        # (sustained 40–60% of the transport wall vs 84–89% for the serial
        # discipline — docs/serving.md). Default off; flip it on real
        # hardware.
        self.pipeline_uploads = bool(pipeline_uploads)
        if self.pipeline_uploads and prefetch_batches < 3:
            raise InvalidInputError(
                "pipeline_uploads=True holds two loader ring slots and "
                "needs prefetch_batches >= 3 (got "
                f"{prefetch_batches}) so the decode workers keep a free "
                "slot"
            )
        # transport='int16' ships raw PCM over the host→device link (half
        # the bytes — the measured binding constraint of config 7) and
        # dequantizes inside the jitted program with the exact power-of-two
        # x·(1/32768). Bit-exact vs 'float32' for mono PCM16 sources (the
        # dominant serving case); other codecs quantize to ≤1 LSB (~3e-5).
        # transport='ulaw' ships ONE byte per sample (G.711 companding,
        # uncomplemented — runtime/ulaw.py): quarter of the float32 bytes,
        # ≈38 dB SQNR — an opt-in lossy tier for tunnel/link-bound
        # deployments; the device expands with six fused integer ops.
        if transport not in ("float32", "int16", "ulaw"):
            raise InvalidInputError(
                f"transport must be 'float32', 'int16' or 'ulaw', "
                f"got {transport!r}"
            )
        self.transport = transport
        self._i16 = transport == "int16"
        self._u8 = transport == "ulaw"
        # A FeatureSet serves like a plan: its one jitted program runs
        # every member over the batch (shared decimation cascade and
        # all), so multi-feature serving decodes/uploads the corpus ONCE.
        self._is_set = hasattr(plan, "_step_impl") and hasattr(
            plan, "_members"
        )
        if sample_rate_hz is not None:
            sr = float(sample_rate_hz)
        elif self._is_set:
            rates = {
                r for r in (_plan_rate(m) for m in plan._members)
                if r is not None
            }
            if len(rates) > 1:
                raise InvalidInputError(
                    f"FeatureSet members disagree on sample rate "
                    f"({sorted(rates)}); pass sample_rate_hz= explicitly"
                )
            if not rates:
                raise InvalidInputError(
                    "FeatureSet of bare callables has no sample rate; "
                    "pass sample_rate_hz="
                )
            sr = rates.pop()
        else:
            r = _plan_rate(plan)
            if r is None:
                raise InvalidInputError(
                    f"{type(plan).__name__} has no discoverable sample "
                    "rate; pass sample_rate_hz="
                )
            sr = r
        self.sample_rate_hz = sr
        self.target_len = int(round(target_seconds * sr))
        if self.target_len <= 0:
            raise InvalidInputError("target_seconds must be positive")
        self.batch_size = int(batch_size)

        # Measured-fastest lowering for THIS serving shape (opt-in: costs
        # one extra compile per losing candidate at startup; a previous
        # decision in the wisdom cache — load_wisdom() — skips the
        # measurement entirely, so restarts are free). With a mesh the
        # candidates are measured at the per-device shard size: the sharded
        # program is the same per-device computation with zero collectives,
        # and the full unsharded batch might not even fit one chip.
        self.autotune_result = None
        if autotune and self._is_set:
            raise InvalidInputError(
                "autotune= is per-plan (it measures method= lowerings); "
                "tune FeatureSet members individually before composing"
            )
        if autotune:
            from .autotune import autotune_plan

            tune_batch = self.batch_size
            if mesh is not None:
                tune_batch = max(1, self.batch_size // mesh.shape[data_axis])
            sample = np.zeros((tune_batch, self.target_len), dtype=plan._dtype)
            self.autotune_result = autotune_plan(plan, sample)
            plan = self.plan = self.autotune_result.plan
        self._n_threads = n_threads
        self._prefetch = prefetch_batches

        if self._i16:
            inv = np.dtype(plan._dtype).type(1.0 / 32768.0)

            def _dequant(q):
                return q.astype(plan._dtype) * inv

        elif self._u8:
            from .runtime.ulaw import ulaw_decode_jax

            def _dequant(q):
                return ulaw_decode_jax(q, plan._dtype)

        else:
            _dequant = None

        if self._is_set:
            # Batch-level forward: the set's one fused program, with the
            # transport dequant folded in front of it.
            if _dequant is None:
                _batch_forward = plan._step_impl
            else:
                def _batch_forward(xb):
                    return plan._step_impl(_dequant(xb))
        elif hasattr(plan, "_forward_impl"):
            if _dequant is None:
                _row_forward = plan._forward_impl
            else:
                def _row_forward(row):
                    return plan._forward_impl(_dequant(row))

            def _batch_forward(xb):
                return jax.vmap(_row_forward)(xb)

        else:
            # Plans without a single-row impl (e.g. MfccPlan) expose a
            # batched forward; calling it inside the transport jit
            # inlines the traced computation.
            fb = plan._forward_batch
            if _dequant is None:
                _batch_forward = fb
            else:
                def _batch_forward(xb):
                    return fb(_dequant(xb))

        self._sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            if self.batch_size % mesh.shape[data_axis] != 0:
                raise InvalidInputError(
                    f"batch_size {batch_size} must divide evenly over the "
                    f"'{data_axis}' mesh axis ({mesh.shape[data_axis]})"
                )
            self._sharding = NamedSharding(mesh, P(data_axis))
            # Cache the mesh-sharded step on the plan (like the non-mesh
            # int16 path): a per-instance closure would be a distinct jit
            # cache key per pipeline, and each distinct program is a
            # 30-90 s remote compile on this rig. (out_shardings is a
            # prefix spec: it broadcasts over a FeatureSet's result tuple.)
            cache = getattr(plan, "_mesh_step_cache", None)
            if cache is None:
                cache = plan._mesh_step_cache = {}
            key = (self.transport, mesh, data_axis)
            step = cache.get(key)
            if step is None:
                step = jax.jit(
                    _batch_forward,
                    in_shardings=self._sharding,
                    out_shardings=self._sharding,
                )
                cache[key] = step
            self._step = step
        elif self._i16 or self._u8:
            # Cache on the plan like _forward_batch: a per-instance closure
            # would be a distinct jit cache key per pipeline (each distinct
            # program is a 30-90 s remote compile on this rig).
            attr = "_i16_forward_batch" if self._i16 else "_u8_forward_batch"
            step = getattr(plan, attr, None)
            if step is None:
                step = jax.jit(_batch_forward)
                setattr(plan, attr, step)
            self._step = step
        elif self._is_set:
            self._step = plan._step  # the set's own jitted program
        else:
            self._step = plan._forward_batch

        # Static per-pipeline frame geometry (fixed target_len ⇒ one jit
        # shape). A FeatureSet carries one geometry PER member (masks are
        # built per member; callables without a declared geometry get no
        # mask).
        if self._is_set:
            self._member_geoms = []
            for m in plan._members:
                st = _plan_stft(m)
                self._member_geoms.append(
                    None if st is None
                    else (st.n_fft, st.hop_size, st.centre)
                )
        else:
            stft = _plan_stft(plan)
            if stft is None:
                raise InvalidInputError(
                    f"{type(plan).__name__} has no discoverable STFT "
                    "geometry for frame masking"
                )
            self._n_frames = frame_count(
                self.target_len, stft.n_fft, stft.hop_size, stft.centre
            )
            self._hop = stft.hop_size
            self._n_fft = stft.n_fft
            self._centre = stft.centre

    @staticmethod
    def _mask_from(lengths, n_fft, hop, centre, n_frames) -> np.ndarray:
        """(B,) sample counts → (B, n_frames) bool of frames with real data."""
        n = np.asarray(lengths, dtype=np.int64)
        pad = n_fft // 2 if centre else 0
        padded = n + 2 * pad
        # frame_count, vectorized (the scalar version is tested against it).
        nf = np.where(padded < n_fft, 1, (padded - n_fft) // hop + 1)
        nf = np.where(n <= 0, 0, np.minimum(nf, n_frames))
        return np.arange(n_frames)[None, :] < nf[:, None]

    def _frame_mask(self, lengths: np.ndarray) -> np.ndarray:
        return self._mask_from(
            lengths, self._n_fft, self._hop, self._centre, self._n_frames
        )

    def _make_batch(self, feats, lengths: np.ndarray):
        """Wrap one step output in the right batch type."""
        if self._is_set:
            masks = []
            for geom, f in zip(self._member_geoms, feats):
                if geom is None or f.ndim < 2:
                    masks.append(None)
                else:
                    # Mask width follows the member's ACTUAL output frames
                    # (multirate members keep the full-rate grid, but a
                    # custom member may not).
                    masks.append(
                        self._mask_from(lengths, *geom, f.shape[-1])
                    )
            return FeatureSetBatch(
                features=tuple(feats),
                lengths=lengths,
                frame_masks=tuple(masks),
            )
        return FeatureBatch(
            features=feats,
            lengths=lengths,
            frame_mask=self._frame_mask(lengths),
        )

    def run(self, paths: Sequence, *, preload: bool = False,
            max_preload_bytes: int = 4 << 30) -> Iterator[FeatureBatch]:
        """Iterate feature batches over the given WAV files.

        ``preload=True`` uploads EVERY batch of the job to the device
        before dispatching the first program, then yields batches
        dispatching compute over the staged device arrays. On rigs whose
        host→device path degrades once a program has executed or loaded
        (see docs/serving.md, "The two-mode tunnel") this moves all
        transport into the fast mode — measured 4.9× end-to-end on the
        config-7 workload — and on any rig it keeps the link streaming
        without interleaved dispatches. The whole job's input must fit device
        memory (guarded by ``max_preload_bytes``); the win applies to
        the FIRST job in a process on two-mode rigs (the mode flip is
        process-permanent), so batch jobs should run one job per process
        there.
        """
        loader = AudioBatchLoader(
            paths,
            batch_size=self.batch_size,
            target_len=self.target_len,
            n_threads=self._n_threads,
            prefetch_batches=self._prefetch,
            expected_sample_rate=int(round(self.sample_rate_hz)),
            on_rate_mismatch=self.on_rate_mismatch,
            dtype=self._loader_dtype,
        )
        if preload:
            self._check_preload_budget(len(paths), max_preload_bytes)
            self._warn_if_mode_already_flipped()
            return self._run_loader_preloaded(loader)
        return self._run_loader(loader)

    def _warn_if_mode_already_flipped(self):
        """Preload's fast-mode staging needs a process that has not
        executed a program yet; autotune=True measures candidates at
        construction (executes programs), so on two-mode rigs the win is
        already gone — say so instead of silently under-delivering."""
        if (
            self.autotune_result is not None
            and self.autotune_result.timings_ms  # {} == wisdom hit, no run
        ):
            import warnings

            warnings.warn(
                "preload=True on a pipeline whose autotune measured "
                "candidates this construction: on rigs whose transfer "
                "path degrades after any program execution (docs/"
                "serving.md, two-mode tunnel), the measurement already "
                "flipped the slow mode, so staging will not see the "
                "fast-mode rates. Persist wisdom (save_wisdom/"
                "load_wisdom) so restarts skip the measurement.",
                stacklevel=3,
            )

    def run_arrays(self, arrays: Sequence, sample_rates=None, *,
                   preload: bool = False,
                   max_preload_bytes: int = 4 << 30) -> Iterator[FeatureBatch]:
        """Iterate feature batches over pre-decoded signals (memory source).

        The codec-agnostic entry: decode anything (FLAC/MP3/opus/…) with
        any library, pass the arrays — batching, padding, rate policy,
        int16 transport and the jitted compute are identical to :meth:`run`
        (`AudioBatchLoader.from_arrays`). ``sample_rates`` is a scalar or
        per-array sequence; omit it to bypass the rate check.
        """
        if sample_rates is None and self.on_rate_mismatch == "error":
            # The file path enforces the rate policy by default; arrays
            # decoded at the wrong rate would produce silently wrong
            # features, so an omitted sample_rates does not silently
            # disable the check the pipeline was configured with.
            import warnings

            warnings.warn(
                "run_arrays called without sample_rates on a pipeline whose "
                f"rate policy is 'error' (expected {self.sample_rate_hz:g} "
                "Hz) — the rate check is bypassed. Pass sample_rates=, or "
                "construct the pipeline with on_rate_mismatch='ignore' to "
                "acknowledge unchecked rates.",
                stacklevel=2,
            )
        loader = AudioBatchLoader.from_arrays(
            arrays,
            batch_size=self.batch_size,
            target_len=self.target_len,
            sample_rates=sample_rates,
            expected_sample_rate=(
                None if sample_rates is None
                else int(round(self.sample_rate_hz))
            ),
            on_rate_mismatch=self.on_rate_mismatch,
            dtype=self._loader_dtype,
        )
        if preload:
            self._check_preload_budget(len(arrays), max_preload_bytes)
            self._warn_if_mode_already_flipped()
            return self._run_loader_preloaded(loader)
        return self._run_loader(loader)

    def _check_preload_budget(self, n_items: int, max_preload_bytes: int):
        """Refuse preload jobs whose staged inputs exceed the budget."""
        itemsize = (
            1 if self._u8 else 2 if self._i16
            else np.dtype(self.plan._dtype).itemsize
        )
        n_batches = -(-n_items // self.batch_size)
        est = n_batches * self.batch_size * self.target_len * itemsize
        if est > max_preload_bytes:
            fmt = lambda b: (
                f"{b / 2**30:.2f} GiB" if b >= 2**30 else f"{b / 2**20:.2f} MiB"
            )
            raise InvalidInputError(
                f"preload=True would stage ~{fmt(est)} of input on the "
                f"device (> max_preload_bytes={fmt(max_preload_bytes)}). "
                "Split the job, use a smaller transport (int16/ulaw), or "
                "raise max_preload_bytes if the device has the memory."
            )

    @property
    def _loader_dtype(self) -> str:
        return (
            "ulaw" if self._u8 else "int16" if self._i16 else "float32"
        )

    def _run_loader(self, loader) -> Iterator[FeatureBatch]:
        # iter_borrowed yields views into the loader's ring slots (the
        # decode already wrote each row in place — no staging copies).
        # Two disciplines (see pipeline_uploads in __init__):
        # - serial (default): upload → block → dispatch per batch; the
        #   loader threads still overlap decode with everything.
        # - pipelined: the slot of batch k−1 stays alive through iteration
        #   k (hold=2), so batch k's upload is enqueued BEFORE blocking on
        #   batch k−1's — wins only where transfers actually overlap.
        # On the CPU backend jnp.asarray may alias host memory, so borrowed
        # rows get an explicit copy and no pipelining (no transfer to hide).
        on_cpu = jax.default_backend() == "cpu"
        if on_cpu or not self.pipeline_uploads:
            for data, lengths, _ in loader.iter_borrowed():
                if on_cpu and (
                    self._i16 or self._u8
                    or np.dtype(self.plan._dtype) == np.float32
                ):
                    data = np.array(data)  # un-alias before the slot recycles
                yield self._emit(self._upload(data), lengths)
            return
        pending = None  # (uploaded-but-not-dispatched xb, lengths)
        try:
            for data, lengths, _ in loader.iter_borrowed(hold=2):
                xb = self._upload(data)  # async: batch k streams now
                prev, pending = pending, (xb, lengths)
                if prev is not None:
                    yield self._emit(*prev)  # blocks on batch k−1's upload
            if pending is not None:
                yield self._emit(*pending)
                pending = None
        finally:
            if pending is not None:
                # The consumer exited with an upload still in flight;
                # wait for it BEFORE iter_borrowed's cleanup releases the
                # ring slot the transfer is reading from.
                jax.block_until_ready(pending[0])

    def warm_preload(self):
        """AOT-compile the serving step for this pipeline's batch shape
        without executing it, caching the executable on the plan.

        CAUTION on two-mode rigs (docs/serving.md): merely *loading* the
        compiled program flips the process into the slow transfer mode —
        measured, benchmarks/preload_serving_ab.json — so do NOT call
        this before a preload job there; ``run(..., preload=True)``
        already orders the compile AFTER the staging uploads. Use it on
        locally-attached devices to pay the compile before the job's
        data arrives. Returns True if the backend supports AOT here.
        """
        dt = (
            jnp.uint8 if self._u8 else jnp.int16 if self._i16
            else jnp.dtype(self.plan._dtype)
        )
        sds = jax.ShapeDtypeStruct((self.batch_size, self.target_len), dt)
        return self._aot_step(sds) is not None

    def _aot_step(self, aval):
        """Compiled-executable cache for the preload path (plan-keyed,
        like the jitted steps — one remote compile per distinct program)."""
        key = (self.transport, tuple(aval.shape), str(aval.dtype),
               self._sharding)
        cache = getattr(self.plan, "_aot_step_cache", None)
        if cache is None:
            cache = self.plan._aot_step_cache = {}
        if key not in cache:
            try:
                cache[key] = self._step.lower(aval).compile()
            except Exception:
                # Do NOT cache the failure: the remote compile helper has
                # transient bad windows, and a poisoned entry would both
                # disable the compile-after-staging ordering for every
                # later pipeline sharing this plan and corrupt the
                # compile_s attribution (the jit compile would then land
                # inside the timed dispatch phase).
                return None
        return cache[key]

    def _run_loader_preloaded(self, loader) -> Iterator[FeatureBatch]:
        # Phase 1: decode + upload the WHOLE job, no program dispatched
        # OR LOADED — on two-mode rigs (docs/serving.md) both execution
        # and loading a compiled program flip the slow transfer mode, so
        # staging must come first; elsewhere it is simply an
        # uninterrupted upload burst. Lengths are copied out of the ring
        # slot because the slot recycles as staging advances.
        import time as _time

        t0 = _time.perf_counter()
        on_cpu = jax.default_backend() == "cpu"
        staged = []
        # A loader error (corrupt file -> IOError after the last good
        # batch, rate-policy violation, ...) must keep the serial loop's
        # ordering: the good prefix is served FIRST, then the error
        # surfaces. Staging stops where the serial loop would have, the
        # staged prefix is dispatched below, and the error re-raises
        # after the last yielded batch
        # (tests/test_serving.py::test_preload_corrupt_file_behaves_like_serial).
        deferred_error = None
        try:
            if self.pipeline_uploads and not on_cpu:
                # DMA-attached discipline: enqueue upload k+1 before
                # blocking on k (two ring slots held) so the link never
                # idles between staged batches.
                pending = None
                try:
                    for data, lengths, _ in loader.iter_borrowed(hold=2):
                        xb = self._upload(data)
                        prev, pending = pending, (xb, np.array(lengths))
                        if prev is not None:
                            jax.block_until_ready(prev[0])
                            staged.append(prev)
                    if pending is not None:
                        jax.block_until_ready(pending[0])
                        staged.append(pending)
                        pending = None
                finally:
                    if pending is not None:
                        # An error left a transfer in flight; wait for it
                        # BEFORE iter_borrowed's cleanup releases the ring
                        # slot the transfer is reading from.
                        jax.block_until_ready(pending[0])
            else:
                for data, lengths, _ in loader.iter_borrowed():
                    if on_cpu:
                        data = np.array(data)  # un-alias before the slot recycles
                    xb = self._upload(data)
                    jax.block_until_ready(xb)
                    staged.append((xb, np.array(lengths)))
        except Exception as e:
            deferred_error = e
        t_stage = _time.perf_counter()
        if not staged:
            self.last_preload_stats = {
                "stage_s": round(t_stage - t0, 4), "compile_s": 0.0,
                "n_batches": 0,
            }
            if deferred_error is not None:
                raise deferred_error
            return
        # Phase 2: compile once (AOT, cached on the plan), then dispatch
        # over the staged arrays. Compile is once-per-process work and is
        # reported separately in last_preload_stats so throughput can be
        # attributed without it.
        step = self._aot_step(staged[0][0]) or self._step
        t_compile = _time.perf_counter()
        self.last_preload_stats = {
            "stage_s": round(t_stage - t0, 4),
            "compile_s": round(t_compile - t_stage, 4),
            "n_batches": len(staged),
        }
        for xb, lengths in staged:
            yield self._make_batch(step(xb), lengths)
        if deferred_error is not None:
            raise deferred_error

    def _upload(self, data):
        """Enqueue the host→device transfer of one borrowed batch."""
        # int16/ulaw transports upload the quantized rows as-is; the jitted
        # step dequantizes on device.
        xb = (
            jnp.asarray(data)
            if self.transport != "float32"
            else jnp.asarray(data, dtype=self.plan._dtype)
        )
        if self._sharding is not None:
            xb = jax.device_put(xb, self._sharding)
        return xb

    def _emit(self, xb, lengths) -> FeatureBatch:
        """Block on the upload, dispatch the compute, build the batch."""
        if jax.default_backend() != "cpu":
            # Wait for the upload BEFORE dispatching the compute: once a
            # consumer of xb is enqueued, block_until_ready(xb) drags the
            # whole execution queue (~400 ms/batch measured over the axon
            # tunnel vs ~18 ms for the bare transfer).
            jax.block_until_ready(xb)
        return self._make_batch(self._step(xb), lengths)

    def throughput_report(self, paths: Sequence, *,
                          preload: bool = False) -> dict:
        """Run once over ``paths`` and report audio-seconds/s end-to-end
        (decode + pad + transfer + compute, overlapped)."""
        import time

        total_audio = 0.0
        t0 = time.perf_counter()
        last = None
        for batch in self.run(paths, preload=preload):
            total_audio += float(batch.lengths.sum()) / self.sample_rate_hz
            last = batch
        if last is not None:
            jax.block_until_ready(last.features)  # array or member tuple
        dt = time.perf_counter() - t0
        rep = {
            "audio_seconds": round(total_audio, 3),
            "wall_seconds": round(dt, 4),
            "audio_s_per_s": round(total_audio / dt, 1) if dt > 0 else 0.0,
        }
        if preload:
            # The one-per-process AOT compile happens inside a preload
            # run (it must follow staging on two-mode rigs); report the
            # steady rate with it excluded, like the serial path's
            # warm-jit convention, alongside the cold total above.
            stats = getattr(self, "last_preload_stats", None)
            if stats is not None:
                rep["preload_phases"] = stats
                steady = dt - stats["compile_s"]
                if steady > 0:
                    rep["audio_s_per_s_excl_compile"] = round(
                        total_audio / steady, 1
                    )
        return rep
