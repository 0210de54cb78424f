"""Generate the committed media fixtures under `data/media/` — tiny
uncompressed files for the REAL decode paths (VERDICT r3 task 5):

- P6 binary PPM images (pure-stdlib parse in
  `operators/multimodal._parse_ppm`): pixel (r, c) channel ch value =
  (r*31 + c*17 + ch*53) % 256 — deterministic integers, no RNG.
- PCM16 mono WAV files (stdlib `wave`): sample[i] =
  ((i * 37) % 201 - 100) * 127 — a deterministic integer waveform.

Idempotent; run `python scripts/gen_media_fixtures.py` to regenerate.
"""

from __future__ import annotations

import wave
from pathlib import Path

OUT = Path(__file__).resolve().parent.parent / "data/media"

PPMS = {"img_rgb_4x4": (4, 4), "img_rgb_6x2": (6, 2)}
WAVS = {"tone_a": (120, 8000), "tone_b": (80, 16000)}


def ppm_bytes(w: int, h: int) -> bytes:
    pixels = bytes(
        (r * 31 + c * 17 + ch * 53) % 256
        for r in range(h)
        for c in range(w)
        for ch in range(3)
    )
    return f"P6\n{w} {h}\n255\n".encode() + pixels


def wav_samples(n: int) -> list[int]:
    return [((i * 37) % 201 - 100) * 127 for i in range(n)]


def main() -> None:
    OUT.mkdir(parents=True, exist_ok=True)
    for name, (w, h) in PPMS.items():
        (OUT / f"{name}.ppm").write_bytes(ppm_bytes(w, h))
    for name, (n, rate) in WAVS.items():
        samples = wav_samples(n)
        raw = b"".join(s.to_bytes(2, "little", signed=True) for s in samples)
        with wave.open(str(OUT / f"{name}.wav"), "wb") as f:
            f.setnchannels(1)
            f.setsampwidth(2)
            f.setframerate(rate)
            f.writeframes(raw)
    for p in sorted(OUT.iterdir()):
        print(p.name, p.stat().st_size, "bytes")


if __name__ == "__main__":
    main()
