import json
rows = []
for sf in (1, 3, 10):
    sp = json.load(open(f".bench_out/r14_spark_sf{sf}.full.json"))["queries"]
    du = json.load(open(f".bench_out/r14_duck_sf{sf}.json"))
    dq, capped = du["queries"], set(du["capped"])
    st, dt = sum(sp.values()), sum(dq.values())
    unc = [k for k in dq if k not in capped]
    su, duu = sum(sp[k] for k in unc if k in sp), sum(dq[k] for k in unc)
    rows.append((sf, round(st,1), round(dt,1), len(capped),
                 round(dt/st,2), round(duu/su,2), len(unc)))
    print(f"sf{sf}: spark {st:.1f}  duck >= {dt:.1f} ({len(capped)} capped)"
          f"  headline >= {dt/st:.2f}x  uncapped {duu/su:.2f}x over {len(unc)}")
    worst = sorted(((sp[k]/dq[k], k, sp[k], dq[k]) for k in unc if k in sp and dq[k] > 0), reverse=True)[:6]
    for r, k, a, b in worst:
        print(f"    worst ratio {k}: spark {a:.1f} vs duck {b:.1f} = {r:.2f}x")
