"""Turnkey first run on a network-connected machine.

The build image is zero-egress, so the released checkpoints (WavLM-Large +
the paper's HiFi-GAN weights) and the real eval backends (Whisper ASR,
speechbrain x-vectors) can never run inside it. This script is the one
command to run the moment the framework lands on a connected box:

    PYTHONPATH=. python tools/first_run.py --work_dir /tmp/knnsvc_first_run \
        [--hifigan /path/to/g_02500000.pt --ckpt_type mix]

Stages (each prints [OK]/[SKIP]/[FAIL]; SKIPs carry the exact reason):
  1. env          — JAX backend/devices, torch availability.
  2. download     — WavLM-Large.pt from the knn-vc release (the URL the
                    reference resolves, ref ddsp_hubconf.py:113-117); the
                    vocoder ckpt is LOCAL in the reference too
                    (ddsp_hubconf.py:65-95 hardcodes pretrained=False), so
                    pass --hifigan for full parity. Without it we fall back
                    to the public knn-vc prematched HiFi-GAN
                    (ckpt_type wavlm_only_original).
  3. convert      — torch checkpoints -> framework pytrees (tools/convert_ckpt).
  4. convert+parity — convert the sample pair; when the config is the
                    shipped golden's (mix + post_opt_0.2), assert max
                    waveform deviation <= 1e-3 vs
                    sample_content/..._knn_mix_post_opt_0.2.wav
                    (BASELINE.md target; tools/parity_check.py is the
                    underlying harness).
  5. eval backends — import-guarded Whisper (transformers) and x-vector
                    (speechbrain) smoke: transcribe / embed the converted
                    output so the intelligibility/speaker-sim harnesses
                    (knnsvc_tpu/eval/) are proven wired on this box.

Inside the zero-egress image every network stage reports [SKIP] with the
egress error and the script exits 0 — it is runnable anywhere, and only
FAILs on a real mismatch.
"""

from __future__ import annotations

import argparse
import os
import sys
import traceback
import urllib.error
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

WAVLM_URL = "https://github.com/bshall/knn-vc/releases/download/v0.1/WavLM-Large.pt"
# the public knn-vc prematched vocoder — ORIGINAL Generator family
# (ref ddsp_hubconf.py:69; loadable here as ckpt_type wavlm_only_original)
KNNVC_G_URL = "https://github.com/bshall/knn-vc/releases/download/v0.1/prematch_g_02500000.pt"

SAMPLE_DIR = "/root/reference/sample_content"
SRC = f"{SAMPLE_DIR}/Danakil-voice_resampled_16000_cut.wav"
REF = f"{SAMPLE_DIR}/Tiken_lead_07_resampled_16000_cut.wav"
GOLDEN_MIX = (
    f"{SAMPLE_DIR}/Danakil-voice_resampled_16000_cut_to_"
    "Tiken_lead_07_resampled_16000_cut_knn_mix_post_opt_0.2.wav"
)

_RESULTS: list[tuple[str, str, str]] = []


def _report(stage: str, status: str, detail: str = "") -> None:
    _RESULTS.append((stage, status, detail))
    print(f"[{status}] {stage}" + (f" — {detail}" if detail else ""), flush=True)


def _download(url: str, dest: Path, timeout: float) -> bool:
    if dest.exists() and dest.stat().st_size > 0:
        _report(f"download {dest.name}", "OK", "already cached")
        return True
    tmp = dest.with_suffix(dest.suffix + ".part")
    try:
        with urllib.request.urlopen(url, timeout=timeout) as r, open(tmp, "wb") as f:
            while True:
                chunk = r.read(1 << 20)
                if not chunk:
                    break
                f.write(chunk)
        tmp.rename(dest)
        _report(f"download {dest.name}", "OK", f"{dest.stat().st_size / 1e6:.0f} MB")
        return True
    except (urllib.error.URLError, TimeoutError, OSError) as e:
        tmp.unlink(missing_ok=True)
        _report(f"download {dest.name}", "SKIP",
                f"no egress to {url.split('/')[2]} ({e!r:.120s})")
        return False


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--work_dir", default="/tmp/knnsvc_first_run")
    parser.add_argument("--hifigan", default=None,
                        help="local g_*.pt of the paper's vocoder (the reference "
                             "loads these locally too); enables the mix golden check")
    parser.add_argument("--ckpt_type", default="mix",
                        help="ckpt_type for --hifigan (mix enables the golden compare)")
    parser.add_argument("--timeout", type=float, default=60.0)
    parser.add_argument("--whisper_model", default="openai/whisper-small")
    args = parser.parse_args(argv)

    work = Path(args.work_dir)
    work.mkdir(parents=True, exist_ok=True)
    converted = work / "converted"

    # ---- stage 1: environment ----
    # Probe the default accelerator in a BOUNDED subprocess first: a dead
    # TPU tunnel makes jax.devices() hang indefinitely in-process (the same
    # failure mode bench.py guards against), and a first-run script that
    # hangs at its first print is useless for diagnosis.
    try:
        import subprocess as _sp

        r = _sp.run([sys.executable, "-c",
                     "import jax; d = jax.devices(); "
                     "print(jax.default_backend(), len(d), jax.__version__)"],
                    capture_output=True, text=True, timeout=args.timeout + 60)
        probe = r.stdout.strip().split() if r.returncode == 0 else None
    except (OSError, _sp.TimeoutExpired):
        probe = None
    import jax

    if probe:
        _report("env: jax", "OK", f"{probe[0]} x{probe[1]} (jax {probe[2]})")
    else:
        jax.config.update("jax_platforms", "cpu")
        _report("env: jax", "OK",
                f"accelerator unreachable (probe timed out) — falling back to "
                f"CPU x{jax.device_count()} (jax {jax.__version__})")
    try:
        import torch  # noqa: F401 — needed by the checkpoint converter

        have_torch = True
        _report("env: torch", "OK", torch.__version__)
    except ImportError as e:
        have_torch = False
        _report("env: torch", "SKIP", f"torch unavailable ({e}); cannot convert .pt")

    # ---- stage 2: checkpoints ----
    wavlm_pt = work / "WavLM-Large.pt"
    have_wavlm = _download(WAVLM_URL, wavlm_pt, args.timeout)
    if args.hifigan:
        hifigan_pt, ckpt_type = Path(args.hifigan), args.ckpt_type
        have_g = hifigan_pt.exists()
        _report("local hifigan ckpt", "OK" if have_g else "FAIL", str(hifigan_pt))
    else:
        hifigan_pt = work / "prematch_g_02500000.pt"
        ckpt_type = "wavlm_only_original"
        have_g = _download(KNNVC_G_URL, hifigan_pt, args.timeout)
        if have_g:
            _report("vocoder choice", "OK",
                    "public knn-vc prematched HiFi-GAN (pass --hifigan for the "
                    "paper's mix vocoder + golden compare)")

    # ---- stage 3: convert to framework pytrees ----
    converted_ok = False
    if have_torch and have_wavlm and have_g:
        try:
            from tools.convert_ckpt import main as convert_main

            rc = convert_main(["--wavlm", str(wavlm_pt), "--hifigan", str(hifigan_pt),
                               "--ckpt_type", ckpt_type, "--out_dir", str(converted)])
            converted_ok = rc == 0
            _report("convert checkpoints", "OK" if converted_ok else "FAIL",
                    str(converted))
        except Exception as e:  # noqa: BLE001 — report, don't crash the stage runner
            traceback.print_exc()
            _report("convert checkpoints", "FAIL", repr(e))
    else:
        missing = [n for n, ok in [("torch", have_torch), ("WavLM-Large.pt", have_wavlm),
                                   ("hifigan ckpt", have_g)] if not ok]
        _report("convert checkpoints", "SKIP", "missing: " + ", ".join(missing))

    # ---- stage 4: sample-pair conversion (+ golden parity when mix) ----
    out_wav = None
    if converted_ok and os.path.exists(SRC):
        try:
            from tools.parity_check import main as parity_main

            is_mix = ckpt_type == "mix"
            rc = parity_main(["--ckpt_dir", str(converted),
                              "--config", "mix_post_opt" if is_mix else "wavlm_only_plain",
                              "--out", str(work / "first_run_out.wav")]
                             + ([] if is_mix else ["--golden", ""]))
            out_wav = work / "first_run_out.wav"
            if is_mix:
                _report("golden parity (<=1e-3)", "OK" if rc == 0 else "FAIL",
                        GOLDEN_MIX)
            else:
                _report("sample conversion", "OK" if rc == 0 else "FAIL", str(out_wav))
        except Exception as e:  # noqa: BLE001
            traceback.print_exc()
            _report("sample conversion", "FAIL", repr(e))
    else:
        _report("sample conversion", "SKIP",
                "no converted checkpoints" if not converted_ok
                else f"sample pair not found at {SAMPLE_DIR}")

    # ---- stage 5: real eval backends (import-guarded) ----
    if not have_wavlm:
        # stage 2 already proved there is no egress; make the hub clients
        # fail fast instead of walking their multi-minute retry ladders
        os.environ.setdefault("HF_HUB_OFFLINE", "1")
        os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")
    probe_wav = str(out_wav) if out_wav and out_wav.exists() else SRC
    try:
        from knnsvc_tpu.eval.intelligibility import default_whisper_transcriber

        transcribe = default_whisper_transcriber(args.whisper_model)
        text = transcribe(probe_wav)
        _report("whisper backend", "OK", f"{args.whisper_model}: {text[:60]!r}")
    except Exception as e:  # noqa: BLE001 — zero-egress wall or missing weights
        _report("whisper backend", "SKIP",
                f"{type(e).__name__}: {e!s:.120s} (intelligibility protocol is "
                "tested offline; see knnsvc_tpu/eval/intelligibility.py)")
    try:
        from speechbrain.inference.speaker import EncoderClassifier  # type: ignore

        clf = EncoderClassifier.from_hparams("speechbrain/spkrec-xvect-voxceleb",
                                             savedir=str(work / "xvect"))
        import torchaudio  # type: ignore

        sig, fs = torchaudio.load(probe_wav)
        emb = clf.encode_batch(sig)
        _report("x-vector backend", "OK", f"embedding dim {tuple(emb.shape)}")
    except Exception as e:  # noqa: BLE001
        _report("x-vector backend", "SKIP",
                f"{type(e).__name__}: {e!s:.120s} (speaker-sim protocol is "
                "tested offline; see knnsvc_tpu/eval/speaker_sim.py)")

    # ---- summary ----
    print("\n== first_run summary ==")
    worst = 0
    for stage, status, detail in _RESULTS:
        print(f"  {status:5s} {stage}")
        if status == "FAIL":
            worst = 1
    n_skip = sum(1 for _, s, _ in _RESULTS if s == "SKIP")
    if n_skip:
        print(f"  ({n_skip} stage(s) skipped — zero-egress or missing artifacts; "
              "rerun on a connected box)")
    return worst


if __name__ == "__main__":
    sys.exit(main())
