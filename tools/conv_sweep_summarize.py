"""Render tools/conv_sweep_r5.jsonl (convergence accelerant sweep at the
1M-row hetero shape) as the markdown comparison table for ROADMAP/README."""
import json
import sys


def main(path="tools/conv_sweep_r5.jsonl"):
    rows = []
    for line in open(path):
        line = line.strip()
        if not line:
            continue
        d = json.loads(line)["detail"]
        rows.append(d)
    print("| α (relaxation) | ρ-adapt coef | reached reference stop "
          "(300-iter cap) | iters to single-machine loglik ±1e-3 "
          "[λ=1/10/100] | ±1e-4 | final z∞ gap [per λ] | "
          "best held-out loglik |")
    print("|---|---|---|---|---|---|---|")
    for d in rows:
        stop = ("**yes** @ iter %d" % d["iterations"]
                if d.get("converged_to_reference_stop") else "no")
        zinf = d.get("z_vs_single_inf_final")
        print("| {a} | {c} | {stop} | {i3} | {i4} | {z} | {b:.6f} |".format(
            a=d.get("relaxation"), c=d.get("rho_adapt_coefficient"),
            stop=stop, i3=d.get("iters_to_single_loglik_1e3"),
            i4=d.get("iters_to_single_loglik_1e4"),
            z=[round(v, 3) for v in zinf] if zinf else None,
            b=d.get("best_loglik")))


if __name__ == "__main__":
    main(*sys.argv[1:])
