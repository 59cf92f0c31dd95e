"""Extract the val-metric curve from a stage-2 val.log into a markdown
table (raw and color-corrected MPSNR/SAM per val step)."""
import re
import sys

rows = []
pat = re.compile(
    r"iter:\s*(\d+)> indices: .*?'MPSNR': np\.float64\(([\d.]+)\).*?"
    r"'SAM': ([\d.]+).*?indices_cc: .*?'MPSNR': np\.float64\(([\d.]+)\).*?"
    r"'SAM': ([\d.]+)"
)
for line in open(sys.argv[1]):
    m = pat.search(line)
    if m:
        rows.append((int(m.group(1)), float(m.group(2)), float(m.group(3)),
                     float(m.group(4)), float(m.group(5))))
print("| iter | MPSNR | SAM | MPSNR (cc) | SAM (cc) |")
print("|---|---|---|---|---|")
for it, p, s, pc, sc in rows:
    print(f"| {it} | {p:.2f} | {s:.2f} | {pc:.2f} | {sc:.2f} |")
