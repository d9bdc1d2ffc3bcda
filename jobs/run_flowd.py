"""Flow daemon entry point — the `cmd/workflow` + `cmd/cron-trigger`
pair as one long-lived process.

The reference deploys its orchestrator as broker-bound services that
run until killed (`pkg/spider/workflow.go:62-81` NATS listeners,
`cmd/cron-trigger/main.go` ticker).  This CLI is that deployment
surface: it binds the REST control plane + webhook endpoint, starts
the continuous trigger consumer and the cron ticker, and serves until
SIGINT/SIGTERM.

    python jobs/run_flowd.py --port 8080 --reconcile-interval 10

Flows are created over HTTP (POST /tenants/{t}/flows), triggered with
POST /trigger, and run automatically — no synchronous /run call
needed.  Each dispatch executes as Ray Data hops, so a burst of 10^5
queued triggers parallelizes across the cluster while this process
only moves queue references.
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
# Ray worker processes don't inherit the driver's sys.path mutation; export
# it so a launch from any cwd (ray job submit working-dir, /tmp scripts)
# still lets workers deserialize spider_ray closures.
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8080,
                    help="0 picks an ephemeral port (printed on start)")
    ap.add_argument("--poll-interval", type=float, default=0.05,
                    help="consumer idle nap between queue polls (s)")
    ap.add_argument("--reconcile-interval", type=float, default=10.0,
                    help="cron tick / schedule-flow reconcile period (s) "
                         "— the reference's 10 s ticker")
    ap.add_argument("--state-dir", default=None,
                    help="durable state: flows snapshot + trigger journal "
                         "+ ack journal; a restart with the same dir keeps "
                         "every flow and replays unconsumed triggers (the "
                         "reference's Mongo + JetStream durability)")
    ap.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                    help="local mode only; ignored on a cluster")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        addr = os.environ.get("RAY_ADDRESS", "local")
        kwargs = {} if addr not in ("local", "") else {"num_cpus": args.num_cpus}
        ray.init(address=addr or "local", include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR", **kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from spider_ray.flow.daemon import FlowDaemon

    d = FlowDaemon(host=args.host, port=args.port,
                   poll_interval=args.poll_interval,
                   reconcile_interval=args.reconcile_interval,
                   state_dir=args.state_dir).start()
    host, port = d.address
    print(json.dumps({"status": "serving", "host": host, "port": port}),
          flush=True)

    def _stop(signum, frame):
        d._stop.set()

    signal.signal(signal.SIGINT, _stop)
    signal.signal(signal.SIGTERM, _stop)
    d._stop.wait()
    d.stop()
    print(json.dumps({"status": "stopped", "counts": d.counts,
                      "errors": len(d.errors)}), flush=True)
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
