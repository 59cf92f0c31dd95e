"""Extract the val-metric curve from a stage-2 val.log into a markdown
table (raw and color-corrected MPSNR/SAM per val step). Key order in
the logged dicts is not stable across runs, so fields are matched
independently within each half of the line."""
import re
import sys


def grab(seg, key):
    m = re.search(rf"'{key}': (?:np\.float\d+\()?([\d.]+)", seg)
    return float(m.group(1)) if m else float("nan")


print("| iter | MPSNR | SAM | MPSNR (cc) | SAM (cc) |")
print("|---|---|---|---|---|")
for line in open(sys.argv[1]):
    m = re.search(r"iter:\s*(\d+)> indices: (.*) indices_cc: (.*?) total",
                  line)
    if not m:
        continue
    it, raw, cc = int(m.group(1)), m.group(2), m.group(3)
    print(f"| {it} | {grab(raw, 'MPSNR'):.2f} | {grab(raw, 'SAM'):.2f} "
          f"| {grab(cc, 'MPSNR'):.2f} | {grab(cc, 'SAM'):.2f} |")
