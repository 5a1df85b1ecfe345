"""Environment + device-link diagnostic. Never hangs.

The remote-TPU tunnel this framework often runs behind has three distinct
failure modes with different symptoms (NOTES.md "Environment pitfalls"):
degraded dispatch (every program costs ~ms extra), a collapsed D2H path
(fetches crawl at KB/s while compute looks healthy), and a full backend
wedge (``jax.devices()`` itself never returns — usually after a Pallas
VMEM overflow). Users see them as "training is slow" / "eval hangs" /
"python hangs"; this tool names which one is happening and what to do.

Every device-touching check runs in a daemon thread under a deadline, so
the doctor itself always terminates. Prints one JSON line on stdout
(machine-readable) and human-readable findings on stderr.

Run: ``python tools/doctor.py [--cpu] [--deadline 120]``.
"""

import argparse
import json
import os
import sys
import threading

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _bounded(fn, seconds):
    """Run fn() in a daemon thread; (value, None) | (None, 'timeout'/err)."""
    box = {}

    def work():
        try:
            box["value"] = fn()
        except Exception as e:  # noqa: BLE001 - diagnostic tool
            box["error"] = f"{type(e).__name__}: {e}"

    th = threading.Thread(target=work, daemon=True)
    th.start()
    th.join(seconds)
    if "value" in box:
        return box["value"], None
    return None, box.get("error", "timeout")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (skips link diagnostics)")
    ap.add_argument("--deadline", type=float, default=240.0,
                    help="seconds before the device backend is declared "
                         "wedged (must exceed the ~75 s first-D2H-fetch "
                         "handshake the probe now pays, NOTES.md)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    report = {"jax": jax.__version__}
    notes = []

    # 1. backend comes up at all ---------------------------------------
    devs, err = _bounded(jax.devices, args.deadline)
    if devs is None:
        report["backend"] = {"status": "wedged", "detail": err}
        notes.append(
            f"FATAL device enumeration did not return within "
            f"{args.deadline:.0f}s ({err}). The remote backend is wedged "
            "- typically after a kernel VMEM overflow; recovery has taken "
            "~1h of idling (NOTES.md). Nothing else can be probed.")
    else:
        report["backend"] = {
            "status": "up",
            "platform": devs[0].platform,
            "device_kind": devs[0].device_kind,
            "n_devices": len(devs),
        }
        notes.append(f"OK backend up: {len(devs)}x {devs[0].device_kind}")

        # 2. link health (H2D / dispatch / D2H) ------------------------
        if not args.cpu:
            # share bench.py's probe AND its health thresholds, so the two
            # tools can never disagree on what "degraded" means
            from bench import _D2H_HEALTHY_MBPS, probe_link

            link, err = _bounded(probe_link, args.deadline)
            if link is None:
                report["link"] = {"status": "wedged", "detail": err}
                notes.append(f"FATAL link probe did not finish ({err}).")
            else:
                report["link"] = link
                if link["healthy"]:
                    notes.append(
                        f"OK link healthy: dispatch {link['dispatch_ms']} "
                        f"ms, D2H {link['d2h_mbps']} MB/s, H2D "
                        f"{link['h2d_mbps']} MB/s")
                    first = link.get("d2h_first_fetch_s")
                    if first is not None and first > 5.0:
                        notes.append(
                            f"WARN first D2H fetch took {first:.0f} s "
                            "(per-process handshake wedge, NOTES.md): "
                            "steady-state is healthy, but every fresh "
                            "process pays this once — budget timeouts "
                            "accordingly.")
                elif link["d2h_mbps"] <= _D2H_HEALTHY_MBPS:
                    notes.append(
                        f"WARN D2H collapsed ({link['d2h_mbps']} MB/s): "
                        "eval/checkpoint fetches will crawl; compute-only "
                        "benchmarks still look fine. Prefer "
                        "dataset.device_cache and async checkpointing; "
                        "distrust any end-to-end number measured now.")
                else:
                    notes.append(
                        f"WARN dispatch degraded ({link['dispatch_ms']} "
                        "ms/call): per-step programs pay the tunnel; set "
                        "train.scan_steps (e.g. 8-32) to amortise it.")

    # 3. host-side libraries -------------------------------------------
    libs = {}
    for mod in ("scipy", "pandas", "tensorboard", "orbax.checkpoint"):
        try:
            __import__(mod)
            libs[mod] = True
        except Exception:
            libs[mod] = False
    so = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "native", "libecgdata.so")
    libs["libecgdata.so"] = os.path.exists(so)
    report["libs"] = libs
    missing = [k for k, v in libs.items() if not v]
    notes.append("OK host libs complete" if not missing else
                 f"WARN missing: {', '.join(missing)} (native kernels fall "
                 "back to scipy; orbax backend unavailable if listed)")

    # 4. Pallas kernel VMEM guards for the flagship shapes --------------
    import importlib

    from semi_seg_ecg_tpu.ops.pallas import gather1d

    # the package re-exports the flash_attention *function*, shadowing the
    # submodule for plain attribute imports
    flash_attention = importlib.import_module(
        "semi_seg_ecg_tpu.ops.pallas.flash_attention")

    report["vmem_guards"] = {
        "flash_attention_n2048_d64": flash_attention.fits_vmem(2048, 64),
        "gather1d_c1_t2500": gather1d.fits_vmem(1, 2500),
    }
    notes.append("OK kernel VMEM guards pass for flagship shapes"
                 if all(report["vmem_guards"].values()) else
                 "WARN a flagship kernel shape fails its VMEM guard")

    for n in notes:
        print(n, file=sys.stderr)
    print(json.dumps(report))
    sys.stdout.flush()
    sys.stderr.flush()
    # a timed-out probe leaves its daemon thread stuck inside the device
    # client's C++ (that's the failure mode being diagnosed); normal
    # interpreter teardown then aborts ("terminate called ... FATAL:
    # exception not rethrown"). Skip teardown — the report is out.
    os._exit(0)


if __name__ == "__main__":
    main()
