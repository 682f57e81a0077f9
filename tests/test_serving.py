"""HTTP serving daemon (serving.py): routing, micro-batching, JSON API.

The reference has no serving process at all (its interface.py:423-470 is a
one-shot CLI); these tests drive the artifact-backed server end-to-end on
CPU: export tiny bucketed artifacts, then check length routing, batch
coalescing, logit parity vs direct ServingModel.predict, and the HTTP
endpoints (predict / healthz / stats, float and base64-int16 payloads).
"""

import base64
import json
import threading
import time
import urllib.request

import numpy as np
import jax
import pytest

from multilingual_multimodal_speech_emotion_recognition_tpu import (
    export as ex, serving)
from multilingual_multimodal_speech_emotion_recognition_tpu.data.tokenizer \
    import HashTokenizer
from multilingual_multimodal_speech_emotion_recognition_tpu.frontend import (
    lid as lid_mod)
from multilingual_multimodal_speech_emotion_recognition_tpu.models import (
    model as mdl)

from test_model import tiny_config

RNG = np.random.default_rng(11)


@pytest.fixture(scope="module")
def bucketed_artifact(tmp_path_factory):
    cfg = tiny_config()
    params = mdl.init_model(jax.random.key(0), cfg)
    out = tmp_path_factory.mktemp("serve") / "export"
    ex.export_buckets(params, cfg, out, buckets=[(0.2, 2), (0.4, 2)],
                      text_tokens=8, with_dsp=True)
    return out, cfg, params


def _core(art, max_wait_ms=5.0):
    router = serving.ArtifactRouter(art)
    return serving.BatchingServer(router,
                                  tokenizer=HashTokenizer(vocab_size=100),
                                  max_wait_ms=max_wait_ms)


# ------------------------------------------------------------------ routing

def test_router_routes_by_length_and_trims(tmp_path):
    # routing needs only index.json — models load lazily, so a synthetic
    # index exercises the routing table without any artifacts
    (tmp_path / "index.json").write_text(json.dumps({
        "buckets": [
            {"dir": "a", "audio_seconds": 0.2, "audio_samples": 3200,
             "batch_size": 4},
            {"dir": "b", "audio_seconds": 0.4, "audio_samples": 6400,
             "batch_size": 2},
        ], "text_tokens": 8, "sample_rate": 16000}))
    router = serving.ArtifactRouter(tmp_path)
    assert router.route(100).audio_samples == 3200
    assert router.route(3200).audio_samples == 3200
    assert router.route(3201).audio_samples == 6400
    # longer than every bucket -> largest (the batch builder trims)
    assert router.route(100_000).audio_samples == 6400
    assert router.text_tokens == 8


def test_router_rejects_non_artifact_dir(tmp_path):
    with pytest.raises(FileNotFoundError):
        serving.ArtifactRouter(tmp_path)


# ------------------------------------------------------------- micro-batch

def test_submit_matches_direct_serving_model(bucketed_artifact):
    art, cfg, params = bucketed_artifact
    core = _core(art)
    try:
        wave = RNG.standard_normal(2500).astype(np.float32) * 0.1
        text = "I am so happy today"
        res = core.submit(wave, text, timeout=300)

        # rebuild the exact padded batch the server ran and compare
        bucket = core.router.route(wave.size)
        B, T = bucket.batch_size, bucket.audio_samples
        audio = np.zeros((B, T), np.float32)
        mask = np.zeros((B, T), np.float32)
        audio[0, :wave.size] = wave
        mask[0, :wave.size] = 1.0
        texts = [text] + [""] * (B - 1)
        ids, tmask = core.tokenizer.encode_batch(texts, 8)
        ents, _, confs = lid_mod.batch_lid(texts)
        out = bucket.model.predict({
            "audio": audio, "audio_mask": mask,
            "text_ids": np.asarray(ids, np.int32),
            "text_mask": np.asarray(tmask, np.float32),
            "lid_entropy": np.asarray(ents, np.float32),
            "lid_conf": np.asarray(confs, np.float32)})
        logits = out["logits"][0].astype(np.float64)
        e = np.exp(logits - logits.max())
        want_probs = e / e.sum()

        assert res["prediction"] == int(logits.argmax())
        assert res["emotion"] == serving.EMOTION_LABELS_6[logits.argmax()]
        # energy OOD score matches -logsumexp of the served logits
        want_energy = -(np.log(np.exp(logits - logits.max()).sum())
                        + logits.max())
        assert res["energy"] == pytest.approx(want_energy, abs=1e-5)
        got_probs = np.asarray([res["probabilities"][k]
                                for k in serving.EMOTION_LABELS_6[:4]])
        np.testing.assert_allclose(got_probs, want_probs, atol=1e-5)
        assert abs(sum(res["probabilities"].values()) - 1.0) < 1e-4
        assert res["bucket_seconds"] == pytest.approx(0.2)
    finally:
        core.close()


def test_concurrent_requests_coalesce_into_one_batch(bucketed_artifact):
    art, _, _ = bucketed_artifact
    core = _core(art, max_wait_ms=500.0)
    try:
        waves = [RNG.standard_normal(2000).astype(np.float32) * 0.1
                 for _ in range(2)]
        results = [None, None]

        def run(i):
            results[i] = core.submit(waves[i], f"text {i}", timeout=300)

        threads = [threading.Thread(target=run, args=(i,)) for i in range(2)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=60)
        assert all(r is not None for r in results)
        s = core.stats_summary()
        # both rode the same device step: one batch, fill 2/2
        assert s["batches"] == 1
        assert s["mean_batch_fill"] == pytest.approx(1.0)
        assert s["requests"] == 2
    finally:
        core.close()


def test_batch_error_propagates_and_server_survives(bucketed_artifact):
    art, _, _ = bucketed_artifact
    core = _core(art)
    try:
        bucket = core.router.buckets[0]
        orig = bucket.model.predict
        bucket.model.predict = lambda b: (_ for _ in ()).throw(
            RuntimeError("injected"))
        with pytest.raises(RuntimeError, match="injected"):
            core.submit(np.ones(1000, np.float32), "x", timeout=300)
        bucket.model.predict = orig
        res = core.submit(np.ones(1000, np.float32) * 0.01, "x", timeout=300)
        assert "emotion" in res
        assert core.stats_summary()["batch_errors"] == 1
    finally:
        core.close()


def test_empty_audio_rejected(bucketed_artifact):
    art, _, _ = bucketed_artifact
    core = _core(art)
    try:
        with pytest.raises(ValueError):
            core.submit(np.zeros(0, np.float32))
    finally:
        core.close()


# ---------------------------------------------------------------- HTTP API

@pytest.fixture()
def http_server(bucketed_artifact):
    art, _, _ = bucketed_artifact
    core = _core(art)
    httpd = serving.make_http_server(core, "127.0.0.1", 0)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()
    core.close()


def _post(url, payload):
    payload = dict(payload)
    payload.setdefault("timeout", 300)
    req = urllib.request.Request(
        url + "/predict", data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req, timeout=360) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_http_predict_float_and_b64_agree(http_server):
    wave = (RNG.standard_normal(2000) * 0.1).astype(np.float32)
    code, res = _post(http_server, {"audio": wave.tolist(),
                                    "text": "hello there"})
    assert code == 200 and "emotion" in res

    pcm = np.clip(wave * 32768.0, -32768, 32767).astype("<i2")
    code2, res2 = _post(http_server, {
        "audio_b64": base64.b64encode(pcm.tobytes()).decode(),
        "text": "hello there"})
    assert code2 == 200
    # int16 quantization of the wave is ~1e-5; predictions agree
    assert res2["prediction"] == res["prediction"]
    assert res2["confidence"] == pytest.approx(res["confidence"], abs=1e-2)


def test_http_resamples_other_rates(http_server):
    wave = (RNG.standard_normal(1000) * 0.1).astype(np.float32)
    code, res = _post(http_server, {"audio": wave.tolist(),
                                    "sample_rate": 8000, "text": ""})
    assert code == 200 and "emotion" in res


def test_http_bad_request_and_unknown_path(http_server):
    code, res = _post(http_server, {"text": "no audio key"})
    assert code == 400 and "error" in res
    with urllib.request.urlopen(http_server + "/healthz", timeout=30) as r:
        health = json.loads(r.read())
    assert health["status"] == "ok"
    assert len(health["buckets"]) == 2
    with urllib.request.urlopen(http_server + "/stats", timeout=30) as r:
        stats = json.loads(r.read())
    assert {"requests", "batches", "latency_ms"} <= set(stats)


# ------------------------------------------------------- vocab mismatch

def test_mismatched_tokenizer_rejected_at_startup(bucketed_artifact):
    # tiny artifact embeds a 100-word table; a full-vocab tokenizer would
    # gather NaN embeddings for OOB ids (jnp.take fill mode) — the server
    # must refuse to start rather than silently serve NaN logits
    art, _, _ = bucketed_artifact
    router = serving.ArtifactRouter(art)
    with pytest.raises(ValueError, match="vocab"):
        serving.BatchingServer(router,
                               tokenizer=HashTokenizer(vocab_size=250002))


def test_oob_token_ids_rejected_per_batch(bucketed_artifact):
    # a tokenizer that under-reports its vocab passes the startup check;
    # the per-batch id-range guard is the backstop
    art, _, _ = bucketed_artifact

    class LyingTokenizer(HashTokenizer):
        def __init__(self):
            super().__init__(vocab_size=50)  # claims 50...

        def encode_batch(self, texts, max_len):
            ids, mask = super().encode_batch(texts, max_len)
            return np.asarray(ids) + 1000, mask  # ...emits ids ≥ 1000

    core = serving.BatchingServer(serving.ArtifactRouter(art),
                                  tokenizer=LyingTokenizer(),
                                  max_wait_ms=5.0)
    try:
        with pytest.raises(RuntimeError, match="out of range"):
            core.submit(np.ones(1000, np.float32) * 0.01,
                        "definitely hashes out of range", timeout=300)
    finally:
        core.close()


def test_server_drives_int16_wire_artifact(tmp_path):
    # serving detects the wire from the spec and ships PCM + lengths;
    # a b64-int16 request round-trips bit-exactly through quantization
    cfg = tiny_config()
    params = __import__(
        "multilingual_multimodal_speech_emotion_recognition_tpu.models.model",
        fromlist=["init_model"]).init_model(jax.random.key(0), cfg)
    ex.export_buckets(params, cfg, tmp_path / "i16",
                      buckets=[(0.2, 2)], text_tokens=8, with_dsp=True,
                      wire="int16")
    core = serving.BatchingServer(
        serving.ArtifactRouter(tmp_path / "i16"),
        tokenizer=HashTokenizer(vocab_size=100), max_wait_ms=5.0)
    try:
        pcm = RNG.integers(-3000, 3000, 2500).astype(np.int16)
        wave = pcm.astype(np.float32) / 32768.0
        res = core.submit(wave, "hello", timeout=300)
        assert "emotion" in res and np.isfinite(res["confidence"])

        # parity vs direct predict on the identical PCM batch
        bucket = core.router.buckets[0]
        ids, tmask = core.tokenizer.encode_batch(["hello", ""], 8)
        ents, _, confs = lid_mod.batch_lid(["hello", ""])
        audio = np.zeros((2, bucket.audio_samples), np.int16)
        audio[0, :pcm.size] = pcm
        out = bucket.model.predict({
            "audio": audio,
            "audio_len": np.array([pcm.size, 0], np.int32),
            "text_ids": np.asarray(ids, np.int32),
            "text_mask": np.asarray(tmask, np.float32),
            "lid_entropy": np.asarray(ents, np.float32),
            "lid_conf": np.asarray(confs, np.float32)})
        assert res["prediction"] == int(out["logits"][0].argmax())
    finally:
        core.close()


def test_close_fails_queued_stragglers_fast(bucketed_artifact):
    """Shutdown drain: requests still sitting in a bucket queue after the
    workers exit must be failed immediately ("server shutting down"), not
    left to hang until their submit() timeout."""
    art, _, _ = bucketed_artifact
    core = _core(art)
    core.close()                      # workers gone
    bucket = core.router.buckets[0]
    req = serving._Pending(audio=np.zeros(10, np.float32), text="")
    core._queues[id(bucket)].put(req)
    core.close()                      # idempotent; drains the straggler
    assert req.done.is_set()
    assert req.error == "server shutting down"


def test_submit_after_close_fails_fast(bucketed_artifact):
    """submit() must refuse new work once close() ran — not enqueue into a
    workerless queue and block for its full timeout."""
    art, _, _ = bucketed_artifact
    core = _core(art)
    core.close()
    t0 = time.perf_counter()
    with pytest.raises(RuntimeError, match="shutting down"):
        core.submit(np.zeros(100, np.float32), timeout=30.0)
    assert time.perf_counter() - t0 < 5.0


def test_submit_racing_close_fails_fast(bucketed_artifact, monkeypatch):
    """A put() landing after close()'s straggler drain (stop-flag set
    between submit's entry check and its enqueue) must still fail fast:
    submit re-drains when it sees the stop flag post-put."""
    art, _, _ = bucketed_artifact
    core = _core(art)
    orig_route = core.router.route

    def route_then_close(n):
        b = orig_route(n)
        core.close()          # races in after submit()'s entry check
        return b

    monkeypatch.setattr(core.router, "route", route_then_close)
    t0 = time.perf_counter()
    with pytest.raises(RuntimeError, match="shutting down"):
        core.submit(np.zeros(100, np.float32), timeout=30.0)
    assert time.perf_counter() - t0 < 10.0


def test_http_server_waits_for_inflight_handlers(bucketed_artifact):
    """ThreadingHTTPServer's daemon_threads=True means socketserver tracks
    (and server_close() joins) NO handler threads; the DrainableServer
    subclass counts them itself so serve()'s drain is real."""
    art, _, _ = bucketed_artifact
    core = _core(art, max_wait_ms=300.0)  # hold batches open: slow handler
    httpd = serving.make_http_server(core, "127.0.0.1", 0)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    url = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        assert httpd.wait_inflight(0.1)   # idle: nothing in flight
        wave = (RNG.standard_normal(1000) * 0.1).astype(np.float32)
        t = threading.Thread(
            target=_post, args=(url, {"audio": wave.tolist()}), daemon=True)
        t.start()
        deadline = time.perf_counter() + 5.0
        while time.perf_counter() < deadline:      # request reaches handler
            with httpd._inflight_cv:
                if httpd._inflight:
                    break
            time.sleep(0.005)
        else:
            pytest.fail("request never became in-flight")
        assert not httpd.wait_inflight(0.05)  # handler blocked in submit()
        assert httpd.wait_inflight(30.0)      # finishes after the batch runs
        t.join(timeout=10.0)
    finally:
        httpd.shutdown()
        httpd.server_close()
        core.close()


def test_calibration_temperature_applied(bucketed_artifact):
    """calibration.json in the artifact dir (shipped by cli/export.py from
    `cli/eval.py --calibrate --save_temperature`) scales served logits:
    probabilities flatten at T>1 but the argmax (and thus the emotion) is
    unchanged; /stats reports the active temperature."""
    art, cfg, params = bucketed_artifact
    wave = RNG.standard_normal(2500).astype(np.float32) * 0.1
    text = "calibration check"

    core = _core(art)
    try:
        base = core.submit(wave, text, timeout=300)
        assert core.stats_summary()["temperature"] == 1.0
    finally:
        core.close()

    T = 4.0
    (art / "calibration.json").write_text(json.dumps({"temperature": T}))
    try:
        core = _core(art)
        try:
            calib = core.submit(wave, text, timeout=300)
            assert core.stats_summary()["temperature"] == T
        finally:
            core.close()
    finally:
        (art / "calibration.json").unlink()

    assert calib["prediction"] == base["prediction"]
    # exact relation: calibrated probs == softmax(logits / T); recover
    # logits (up to a constant) from the baseline probs
    base_p = np.asarray([base["probabilities"][k]
                         for k in serving.EMOTION_LABELS_6[:4]])
    logits = np.log(base_p)
    e = np.exp(logits / T - (logits / T).max())
    want = e / e.sum()
    got = np.asarray([calib["probabilities"][k]
                      for k in serving.EMOTION_LABELS_6[:4]])
    np.testing.assert_allclose(got, want, atol=2e-4)
    # the energy OOD score is computed from RAW logits, so shipping a
    # calibration must NOT rescale it (client-side OOD thresholds fitted
    # before calibration stay valid)
    assert calib["energy"] == pytest.approx(base["energy"], abs=1e-5)
    assert calib["confidence"] < base["confidence"]  # T>1 flattens


def test_bad_calibration_temperature_refused(bucketed_artifact):
    """A zero/negative/NaN temperature in calibration.json must refuse to
    start the router (T<0 flips argmax, T=0 yields NaN softmax) rather
    than silently serve corrupted predictions."""
    art, cfg, params = bucketed_artifact
    for bad in (0.0, -2.0, float("nan")):
        (art / "calibration.json").write_text(
            json.dumps({"temperature": bad}))
        try:
            with pytest.raises(ValueError, match="temperature"):
                serving.ArtifactRouter(art)
        finally:
            (art / "calibration.json").unlink()


# ----------------------------------------------------------------- cascade

@pytest.fixture(scope="module")
def teacher_artifact(tmp_path_factory):
    """A second ('teacher') artifact from a different seed so cascade
    answers are distinguishable from the student's."""
    cfg = tiny_config()
    params = mdl.init_model(jax.random.key(99), cfg)
    out = tmp_path_factory.mktemp("serve_teacher") / "export"
    ex.export_buckets(params, cfg, out, buckets=[(0.2, 2), (0.4, 2)],
                      text_tokens=8, with_dsp=True)
    return out, cfg, params


def test_cascade_escalates_on_low_confidence(bucketed_artifact,
                                             teacher_artifact):
    """CascadeServer: confident requests are answered by the student tier;
    with an impossible confidence bar every request escalates and the
    answer equals the teacher tier's own."""
    s_art, _, _ = bucketed_artifact
    t_art, _, _ = teacher_artifact
    wave = RNG.standard_normal(2500).astype(np.float32) * 0.1
    text = "cascade check"

    teacher_direct = _core(t_art)
    try:
        want = teacher_direct.submit(wave, text, timeout=300)
    finally:
        teacher_direct.close()

    # threshold 0: nothing escalates — the student answers
    cas = serving.CascadeServer(_core(s_art), _core(t_art),
                                confidence_threshold=0.0)
    try:
        res = cas.submit(wave, text, timeout=300)
        assert res["escalated"] is False
        assert cas.stats_summary()["escalation_rate"] == 0.0
        student_pred = res["probabilities"]
    finally:
        cas.close()

    # threshold 1.01: everything escalates — the teacher answers
    cas = serving.CascadeServer(_core(s_art), _core(t_art),
                                confidence_threshold=1.01)
    try:
        res = cas.submit(wave, text, timeout=300)
        assert res["escalated"] is True
        assert "student_confidence" in res
        assert res["probabilities"] == want["probabilities"]
        assert res["probabilities"] != student_pred
        st = cas.stats_summary()
        assert st["escalations"] == st["requests"] == 1
        assert st["student"]["requests"] == 1
        assert st["teacher"]["requests"] == 1
    finally:
        cas.close()


def test_cascade_energy_threshold(bucketed_artifact, teacher_artifact):
    """The energy gate escalates OOD-looking clips even when the student
    is (over)confident: with the bar just below/above the observed energy
    the same request flips between tiers."""
    s_art, _, _ = bucketed_artifact
    t_art, _, _ = teacher_artifact
    wave = RNG.standard_normal(2500).astype(np.float32) * 0.1

    probe = _core(s_art)
    try:
        energy = probe.submit(wave, "x", timeout=300)["energy"]
    finally:
        probe.close()

    for bar, want_escalated in ((energy + 1.0, False), (energy - 1.0, True)):
        cas = serving.CascadeServer(_core(s_art), _core(t_art),
                                    confidence_threshold=0.0,
                                    energy_threshold=bar)
        try:
            res = cas.submit(wave, "x", timeout=300)
            assert res["escalated"] is want_escalated, bar
        finally:
            cas.close()


def test_cascade_serves_http(bucketed_artifact, teacher_artifact):
    """CascadeServer duck-types the core protocol: the stock HTTP server
    runs it unmodified and /stats reports both tiers."""
    import http.client

    s_art, _, _ = bucketed_artifact
    t_art, _, _ = teacher_artifact
    cas = serving.CascadeServer(_core(s_art), _core(t_art),
                                confidence_threshold=1.01)
    httpd = serving.make_http_server(cas, "127.0.0.1", 0)
    port = httpd.server_address[1]
    th = threading.Thread(target=httpd.serve_forever, daemon=True)
    th.start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
        wave = (RNG.standard_normal(2000) * 0.1).astype(np.float32)
        conn.request("POST", "/predict", json.dumps(
            {"audio": wave.tolist(), "sample_rate": 16000, "text": "hi"}))
        res = json.loads(conn.getresponse().read())
        assert res["escalated"] is True
        conn.request("GET", "/stats")
        st = json.loads(conn.getresponse().read())
        assert st["escalations"] == 1
        assert st["teacher"]["requests"] == 1
    finally:
        httpd.shutdown()
        httpd.server_close()
        cas.close()
