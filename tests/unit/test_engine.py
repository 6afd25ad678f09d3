"""Continuous-batching serving engine (streaming/engine.py).

The engine's contract: a request's output is a pure function of
(prompt, seed, params) — independent of which lane it lands in, which
requests share the batch, and when it was admitted relative to the
engine's circular-buffer phase.  That is exactly what the buffer
rotation in ``_admit_impl`` plus per-lane PRNG keys must buy.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from spectral_tpu.streaming.engine import Request, ServingEngine

from test_streaming import make_model, tiny_cfg


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_cfg(n_layers=2)
    model, params = make_model(cfg, open_freq_gate=False, active_ctx_gate=True)
    return cfg, params


class TestServingEngine:
    def test_queue_drains_in_submission_order(self, setup):
        cfg, params = setup
        eng = ServingEngine(params, cfg, slots=2, decode_chunk=8)
        reqs = [Request(prompt=f"req {i}: the cat", max_new=8 + 4 * i, seed=i)
                for i in range(5)]
        results = eng.run(reqs)
        assert len(results) == 5
        for i, (req, res) in enumerate(zip(reqs, results)):
            assert res is not None
            body = res.encode("utf-8", errors="ignore")
            assert res.startswith(f"req {i}:")
            # completion is exactly max_new bytes (no stop sequences here)
            enc = req.prompt.encode("utf-8")
            assert len(res.encode("utf-8", errors="replace")) >= len(enc)

    def test_output_invariant_to_cotenants_and_arrival(self, setup):
        """The same (prompt, seed) request must produce the same text when
        served alone in a 1-lane engine and when queued behind/alongside
        other requests in a busy 2-lane engine (different lane, different
        admission phase ptr != 0, different co-tenants)."""
        cfg, params = setup
        probe = Request(prompt="the cat sat on", max_new=24, seed=42)

        alone = ServingEngine(params, cfg, slots=1, decode_chunk=8).run([probe])[0]

        noise = [Request(prompt=f"noise {i} " * 3, max_new=12 + 8 * i, seed=100 + i)
                 for i in range(3)]
        # probe is queued third: it gets admitted mid-run, at a nonzero
        # circular-buffer phase, into whichever lane frees first
        busy = ServingEngine(params, cfg, slots=2, decode_chunk=8).run(
            noise[:2] + [probe] + noise[2:])
        assert busy[2] == alone

    def test_chunk_size_does_not_change_output(self, setup):
        """Chunking is a host-sync granularity, not math: the same queue
        must produce identical results under different decode_chunk."""
        cfg, params = setup
        reqs = [Request(prompt="alpha beta", max_new=16, seed=7),
                Request(prompt="gamma delta", max_new=16, seed=8)]
        a = ServingEngine(params, cfg, slots=2, decode_chunk=4).run(reqs)
        b = ServingEngine(params, cfg, slots=2, decode_chunk=16).run(reqs)
        assert a == b

    def test_stop_sequence_truncates(self, setup):
        cfg, params = setup
        eng = ServingEngine(params, cfg, slots=1, decode_chunk=8)
        req = Request(prompt="hello", max_new=40, seed=3, stop=" ")
        (res,) = eng.run([req])
        comp = res.encode("utf-8", errors="replace")[len(b"hello"):]
        # either the stop byte was hit (completion ends with it, nothing
        # after) or it never occurred within max_new bytes
        if b" " in comp:
            assert comp.endswith(b" ")
            assert len(comp) <= 40
        else:
            assert len(comp) == 40

    def test_mesh_sharded_lanes_match_unsharded(self, setup):
        """Data-parallel serving: lanes sharded over a dp mesh produce
        byte-identical results (lane ops are independent along N — the
        sharding introduces no collectives and no math change)."""
        import jax
        from jax.sharding import Mesh

        cfg, params = setup
        reqs = [Request(prompt=f"prompt {i}", max_new=12, seed=20 + i)
                for i in range(6)]
        base = ServingEngine(params, cfg, slots=4, decode_chunk=8).run(reqs)

        devs = np.asarray(jax.devices()[:4]).reshape(4, 1, 1)
        mesh = Mesh(devs, axis_names=("dp", "sp", "tp"))
        sharded = ServingEngine(params, cfg, slots=4, decode_chunk=8,
                                mesh=mesh).run(reqs)
        assert sharded == base

    def test_priority_policy_orders_admission_not_output(self, setup):
        """With one lane, policy="priority" must serve the high-priority
        request first (completion_order), while every request's TEXT stays
        identical to its fifo-served counterpart (admission invariance)."""
        cfg, params = setup
        reqs = [Request(prompt=f"req {i}", max_new=8, seed=i, priority=i)
                for i in range(3)]  # req 2 has the highest priority
        fifo_eng = ServingEngine(params, cfg, slots=1, decode_chunk=8)
        fifo = fifo_eng.run([Request(**r.__dict__) for r in reqs])
        assert fifo_eng.completion_order == [0, 1, 2]

        prio_eng = ServingEngine(params, cfg, slots=1, decode_chunk=8,
                                 policy="priority")
        prio = prio_eng.run([Request(**r.__dict__) for r in reqs])
        assert prio_eng.completion_order == [2, 1, 0]
        assert prio == fifo  # results submission-indexed, text unchanged

    def test_sjf_and_edf_orderings(self, setup):
        cfg, params = setup
        reqs = [Request(prompt="a", max_new=24, seed=1, deadline=3.0),
                Request(prompt="b", max_new=8, seed=2, deadline=1.0),
                Request(prompt="c", max_new=16, seed=3)]  # no deadline
        sjf = ServingEngine(params, cfg, slots=1, decode_chunk=8, policy="sjf")
        sjf.run([Request(**r.__dict__) for r in reqs])
        assert sjf.completion_order == [1, 2, 0]  # by max_new

        edf = ServingEngine(params, cfg, slots=1, decode_chunk=8, policy="edf")
        edf.run([Request(**r.__dict__) for r in reqs])
        # deadline 1.0 first, then 3.0; deadline-less last
        assert edf.completion_order == [1, 0, 2]

    def test_tail_chunk_bucketing_saves_device_tokens(self, setup):
        """A short request under a large decode_chunk must not pay the full
        chunk: the scan length drops to the smallest power-of-two bucket,
        and outputs are identical to a small-chunk engine."""
        cfg, params = setup
        req = Request(prompt="the cat", max_new=4, seed=5)
        big = ServingEngine(params, cfg, slots=1, decode_chunk=32)
        out_big = big.run([Request(**req.__dict__)])
        assert big.stats["decoded_tokens"] == 4  # one 4-bucket scan, not 32

        small = ServingEngine(params, cfg, slots=1, decode_chunk=4)
        out_small = small.run([Request(**req.__dict__)])
        assert out_big == out_small

    def test_prefill_matches_decoder_init(self, setup):
        """Admission logits == OverlapSaveBatch.init_state on the same
        padded window (the engine adds no math of its own at prefill)."""
        from spectral_tpu.streaming.overlap_save_batch import OverlapSaveBatch

        cfg, params = setup
        eng = ServingEngine(params, cfg, slots=1, decode_chunk=4)
        req = Request(prompt="the cat", max_new=4, seed=0)
        enc, fb, fl, fs, fk = eng._prefill(req)

        dec = OverlapSaveBatch(params, cfg)
        T = dec.T
        window = np.full((1, T), 32, np.int32)
        window[0, T - len(enc):] = enc
        _, logits = dec.init_state(window)
        np.testing.assert_allclose(np.asarray(fl), np.asarray(logits),
                                   rtol=1e-5, atol=1e-5)

    def test_continuous_admission_matches_batch(self, setup):
        """Requests submitted MID-DECODE (between step() calls) must get
        byte-identical text to a batch run of the same requests — the
        admission-invariance contract extended to live arrivals."""
        cfg, params = setup
        reqs = [Request(prompt=f"live {i}: the dog", max_new=8 + 4 * i,
                        seed=10 + i) for i in range(4)]

        batch = ServingEngine(params, cfg, slots=2, decode_chunk=8).run(
            [Request(**r.__dict__) for r in reqs])

        eng = ServingEngine(params, cfg, slots=2, decode_chunk=8)
        ids = [eng.submit(Request(**reqs[0].__dict__)),
               eng.submit(Request(**reqs[1].__dict__))]
        eng.step()  # both lanes mid-flight, nonzero buffer phase
        ids.append(eng.submit(Request(**reqs[2].__dict__)))  # live arrival
        eng.step()
        ids.append(eng.submit(Request(**reqs[3].__dict__)))  # another
        while not eng.idle:
            eng.step()
        live = [eng.results[rid] for rid in ids]
        assert live == batch

    def test_prefill_exact_matches_solo(self, setup):
        """prefill_exact=True admits via per-request M=1 prefills, so a
        request's text must not depend on TRAFFIC: the busy run must
        equal a SAME-CONFIG engine serving that request alone (round-5:
        the guarantee is per engine config — cross-config (different
        slots) equality is real-arithmetic only, since XLA compiles
        different programs per lane count)."""
        cfg, params = setup
        reqs = [Request(prompt=f"exact {i}: a cat", max_new=8 + 4 * i,
                        seed=20 + i) for i in range(3)]
        busy = ServingEngine(params, cfg, slots=2, decode_chunk=8,
                             prefill_exact=True).run(
            [Request(**r.__dict__) for r in reqs])
        for i, r in enumerate(reqs):
            solo = ServingEngine(params, cfg, slots=2, decode_chunk=8,
                                 prefill_exact=True).run(
                [Request(**r.__dict__)])[0]
            assert busy[i] == solo

    def test_step_returns_completions_and_reuses_slots(self, setup):
        cfg, params = setup
        eng = ServingEngine(params, cfg, slots=1, decode_chunk=8)
        a = eng.submit(Request(prompt="first", max_new=8, seed=1))
        done = eng.step()
        assert done and done[0][0] == a  # finished in one 8-chunk
        assert eng.idle and eng._free == [0]
        b = eng.submit(Request(prompt="second", max_new=8, seed=2))
        done = eng.step()
        assert done[0][0] == b  # same slot serves the next request
        assert eng.results[b].startswith("second")

    def test_sjf_improves_mean_turnaround(self, setup):
        """One long request ahead of three short ones on a single lane:
        SJF must beat FIFO on mean turnaround measured on the token work
        clock (cumulative scan tokens) — the anti-convoy property,
        measurable on CPU."""
        cfg, params = setup
        def queue():
            return [Request(prompt="long", max_new=32, seed=1),
                    Request(prompt="s1", max_new=8, seed=2),
                    Request(prompt="s2", max_new=8, seed=3),
                    Request(prompt="s3", max_new=8, seed=4)]

        fifo = ServingEngine(params, cfg, slots=1, decode_chunk=8)
        fifo.run(queue())
        sjf = ServingEngine(params, cfg, slots=1, decode_chunk=8, policy="sjf")
        sjf.run(queue())
        assert sjf.turnaround()["mean"] < fifo.turnaround()["mean"]
        assert sjf.turnaround()["completed"] == 4

    def test_async_drain_matches_sync(self, setup):
        """step(fetch=False) must produce byte-identical results to the
        per-chunk-sync path — deferral changes WHEN bytes are read, never
        what they are.  Completions surface as (id, None) and the text
        lands at finalize()."""
        cfg, params = setup
        reqs = [Request(prompt=f"async {i}", max_new=8 + 4 * i, seed=40 + i)
                for i in range(4)]

        sync_eng = ServingEngine(params, cfg, slots=2, decode_chunk=8)
        sync_eng.start()
        ids = [sync_eng.submit(Request(**r.__dict__)) for r in reqs]
        while not sync_eng.idle:
            sync_eng.step(fetch=True)
        sync = [sync_eng.results[i] for i in ids]

        eng = ServingEngine(params, cfg, slots=2, decode_chunk=8)
        eng.start()
        ids = [eng.submit(Request(**r.__dict__)) for r in reqs]
        deferred = []
        while not eng.idle:
            deferred += eng.step(fetch=False)
        assert all(text is None for _, text in deferred)  # nothing fetched
        assert eng._chunk_outs or eng._deferred  # fetches actually deferred
        eng.finalize()
        assert not eng._chunk_outs and not eng._deferred
        assert [eng.results[i] for i in ids] == sync

    def test_async_auto_finalize_bounds_pending(self, setup):
        """A long async session must not accumulate unbounded device chunk
        outputs: step() auto-finalizes past MAX_PENDING_CHUNKS.  MAX_MULTI
        is pinned to 1 so scans genuinely outnumber the cap and the
        auto-finalize branch (including mid-drain span materialization for
        the still-active lane) demonstrably fires."""
        cfg, params = setup
        eng = ServingEngine(params, cfg, slots=1, decode_chunk=1)
        eng.MAX_PENDING_CHUNKS = 2
        eng.MAX_MULTI = 1  # one 1-token scan per step -> 16 pending chunks
        eng.start()
        rid = eng.submit(Request(prompt="bound", max_new=16, seed=9))
        fired = False
        while not eng.idle:
            eng.step(fetch=False)
            assert len(eng._chunk_outs) <= 2 + 1
            if eng.stats["chunks"] > eng.MAX_PENDING_CHUNKS and not eng._chunk_outs:
                # auto-finalize cleared pending outputs while the lane was
                # still mid-decode: its span parts were materialized
                fired = True
                assert all(isinstance(p, list)
                           for l in eng._lanes.values() for p in l.parts)
        assert fired
        eng.finalize()
        assert rid in eng.results

    def test_stop_lane_caps_scan_length(self, setup):
        """A stop-bearing lane's event horizon is unknowable, so its
        presence must cap the scan at ONE decode_chunk — otherwise up to
        MAX_MULTI*chunk tokens decode past the stop while the slot stays
        occupied and pending requests convoy behind the scan."""
        from spectral_tpu.streaming.engine import _Lane

        cfg, params = setup
        eng = ServingEngine(params, cfg, slots=2, decode_chunk=8)
        free = _Lane(index=0, req=Request(prompt="a", max_new=256), slot=0)
        assert eng._bucket({0: free}) == 8 * eng.MAX_MULTI  # multi-chunk ok
        stopper = _Lane(index=1, req=Request(prompt="b", max_new=256,
                                             stop="x"), slot=1)
        assert eng._bucket({0: free, 1: stopper}) == 8  # capped at one chunk
        # a sub-chunk tail still shrinks below the chunk
        tail = _Lane(index=2, req=Request(prompt="c", max_new=3, stop="x"),
                     slot=0)
        assert eng._bucket({0: tail}) == 4

    def test_stop_sequence_forces_fetch_in_async_mode(self, setup):
        """A stop-bearing request decoded with fetch=False must still
        truncate at the stop string (its chunks fetch regardless)."""
        cfg, params = setup
        req = Request(prompt="hello", max_new=40, seed=3, stop=" ")
        sync = ServingEngine(params, cfg, slots=1, decode_chunk=8).run(
            [Request(**req.__dict__)])[0]

        eng = ServingEngine(params, cfg, slots=1, decode_chunk=8)
        eng.start()
        rid = eng.submit(Request(**req.__dict__))
        while not eng.idle:
            eng.step(fetch=False)
        eng.finalize()
        assert eng.results[rid] == sync

    def test_admission_round_shares_one_prefill(self, setup):
        """M co-arriving requests must cost ONE batched prefill forward,
        not M (serving is prefill-bound), with per-request text identical
        to solo-served runs (the M=1 prefill)."""
        cfg, params = setup
        reqs = [Request(prompt=f"share {i}", max_new=8, seed=30 + i)
                for i in range(4)]

        solo = [ServingEngine(params, cfg, slots=1, decode_chunk=8).run(
                    [Request(**r.__dict__)])[0] for r in reqs]

        eng = ServingEngine(params, cfg, slots=4, decode_chunk=8)
        outs = eng.run([Request(**r.__dict__) for r in reqs])
        assert eng.stats["prefill_calls"] == 1  # one [4, T] forward
        assert outs == solo
