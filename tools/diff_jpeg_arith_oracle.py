"""Differential oracle for the arithmetic-coded JPEG decoder
(receipt_scanner_spark/extract/jarith.py) against the SYSTEM libjpeg,
which ships both arithmetic directions (jinit_arith_encoder/decoder).

Compiles tools/jarith_helper.c with the host C compiler (no installs
— same spirit as the node-based parser oracles) and sweeps:

1. libjpeg arithmetic ENCODE -> our decode vs libjpeg's own decode
   (tolerance: IDCT rounding only, |diff| <= 2, mean < 0.05);
2. coefficient-preserving Huffman<->arithmetic TRANSCODES
   (jpeg_read/write_coefficients) -> our decodes must be
   BIT-IDENTICAL (the entropy layers feed the same shared IDCT);
3. our in-test arithmetic ENCODER -> libjpeg transcode back to
   Huffman -> bit-identical decode (reverse interop).

Run: python tools/diff_jpeg_arith_oracle.py [n_images]
Prints one summary line; exits nonzero on any divergence.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from receipt_scanner_spark.extract.jpeg import decode_jpeg  # noqa: E402

HELPER_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "jarith_helper.c")


def build_helper() -> str:
    cc = shutil.which("cc") or shutil.which("gcc")
    if cc is None:
        print("SKIP: no C compiler on this host")
        sys.exit(0)
    exe = os.path.join(tempfile.mkdtemp(prefix="jarith"), "jarith")
    subprocess.run([cc, "-O2", "-o", exe, HELPER_SRC, "-ljpeg"], check=True)
    return exe


def run(exe, args, payload):
    return subprocess.run(
        [exe, *args], input=payload, capture_output=True, check=True
    ).stdout


def pnm(px: np.ndarray) -> bytes:
    h, w = px.shape[:2]
    magic = b"P5" if px.ndim == 2 else b"P6"
    return magic + f"\n{w} {h}\n255\n".encode() + px.tobytes()


def unpgm(data: bytes) -> np.ndarray:
    head, px = data.split(b"255\n", 1)
    dims = head.split()[1:3]
    w, h = int(dims[0]), int(dims[1])
    return np.frombuffer(px, dtype=np.uint8).reshape(h, w)


def main() -> int:
    n_images = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    exe = build_helper()
    rng = np.random.default_rng(20260818)
    checks = fails = 0

    for i in range(n_images):
        h = int(rng.integers(8, 120))
        w = int(rng.integers(8, 120))
        color = bool(rng.integers(0, 2))
        yy, xx = np.mgrid[0:h, 0:w]
        base = 128 + 60 * np.sin(yy / (2 + rng.random() * 8)) + 50 * np.cos(
            xx / (2 + rng.random() * 8)
        )
        noise = rng.normal(0, rng.random() * 40, (h, w))
        px = np.clip(base + noise, 0, 255).astype(np.uint8)
        if color:
            px = np.stack(
                [px, np.roll(px, 3, 0), rng.integers(0, 256, (h, w))], axis=2
            ).astype(np.uint8)
        q = int(rng.integers(20, 98))
        rst = int(rng.choice([0, 0, 1, 2, 5]))
        prog = int(rng.integers(0, 2))

        # 1. libjpeg arith encode -> our decode vs libjpeg decode
        jp = run(exe, ["enc", str(q), str(prog), str(rst), "1"], pnm(px))
        ref = unpgm(run(exe, ["dec"], jp))
        mine = decode_jpeg(jp)
        d = np.abs(mine.astype(int) - ref.astype(int))
        checks += 1
        if d.max() > 2 or d.mean() >= 0.05:
            fails += 1
            print(f"FAIL enc {h}x{w} q={q} rst={rst} prog={prog} "
                  f"color={color}: max={d.max()} mean={d.mean():.4f}")

        # 2. transcode twins decode bit-identically
        huff = run(exe, ["enc", str(q), str(prog), str(rst), "0"], pnm(px))
        arith = run(exe, ["trans", "1", str(prog), str(rst)], huff)
        checks += 1
        if not np.array_equal(decode_jpeg(huff), decode_jpeg(arith)):
            fails += 1
            print(f"FAIL trans {h}x{w} q={q} rst={rst} prog={prog} color={color}")

        # 2b. multi-scan sequential twin (per-component scan script)
        if not prog:
            mscan = run(exe, ["trans", "0", "2", str(rst)], huff)
            checks += 1
            if not np.array_equal(decode_jpeg(huff), decode_jpeg(mscan)):
                fails += 1
                print(f"FAIL mscan {h}x{w} q={q} rst={rst} color={color}")

        # 2c. 4-channel CMYK/YCCK vs libjpeg's own CMYK output.
        # Smooth ink ramps: random per-pixel chroma would measure the
        # DOCUMENTED nearest-vs-fancy chroma upsampling divergence,
        # not the entropy/colorspace decode under test.
        cmyk = np.stack(
            [np.clip(128 + 80 * np.sin(yy / (3 + i) + i) + noise / 4, 0, 255)
             for i in range(4)],
            axis=2,
        ).astype(np.uint8)
        transform = int(rng.choice([0, 2]))
        jp4 = run(
            exe, ["enc4", str(q), str(transform), str(prog)],
            f"RAW4 {w} {h}\n".encode() + cmyk.tobytes(),
        )
        ref4 = np.frombuffer(
            run(exe, ["dec4"], jp4).split(b"\n", 1)[1], dtype=np.uint8
        ).reshape(h, w, 4).astype(np.float64)
        want = np.clip(
            np.round(
                (0.299 * ref4[..., 0] + 0.587 * ref4[..., 1]
                 + 0.114 * ref4[..., 2]) * (ref4[..., 3] / 255.0)
            ), 0, 255,
        )
        d4 = np.abs(decode_jpeg(jp4).astype(float) - want)
        checks += 1
        # IDCT/colorspace rounding on two channels compounds through
        # the K multiply: +/-2 is the rounding envelope
        if d4.max() > 2 or d4.mean() > 0.15:
            fails += 1
            print(f"FAIL cmyk {h}x{w} q={q} transform={transform} "
                  f"prog={prog}: max={d4.max():.0f} mean={d4.mean():.3f}")

    # 3. reverse interop over the in-test encoder
    sys.path.insert(0, os.path.join(os.path.dirname(HELPER_SRC), "..", "tests"))
    os.environ.setdefault("SPARK_GRAFT_NO_SPARK", "1")
    from tests.test_jpeg_arith import _gray, encode_jpeg_arith  # noqa: E402

    for seed in range(10):
        px = _gray(int(rng.integers(8, 80)), int(rng.integers(8, 80)), seed=seed)
        arith = encode_jpeg_arith(
            [px],
            q=int(rng.integers(1, 16)),
            restart=int(rng.choice([0, 2])),
            dc_lu=(int(rng.integers(0, 3)), int(rng.integers(3, 8))),
            kx=int(rng.integers(1, 63)),
        )
        huff = run(exe, ["trans", "0", "0", "0"], arith)
        checks += 1
        if not np.array_equal(decode_jpeg(arith), decode_jpeg(huff)):
            fails += 1
            print(f"FAIL reverse seed={seed}")

    print(f"jpeg-arith differential: {fails}/{checks} divergences")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
