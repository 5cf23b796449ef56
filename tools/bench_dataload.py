import sys, os, time; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
from PIL import Image
from tfcgan_tpu.data import native
from tfcgan_tpu.data.pairs import load_pair, _normalize

rng = np.random.RandomState(0)
imgs = rng.randint(0, 256, (64, 512, 1024, 3), np.uint8)

t0 = time.perf_counter()
for i in range(64):
    im = Image.fromarray(imgs[i], "RGB")
    w, h = im.size
    a = np.asarray(im.crop((0,0,w/2,h)).resize((256,256), Image.Resampling.BICUBIC))
    b = np.asarray(im.crop((w/2,0,w,h)).resize((256,256), Image.Resampling.BICUBIC))
    _ = _normalize(a); _ = _normalize(b)
print(f"PIL path: {(time.perf_counter()-t0)/64*1000:.2f} ms/img")

t0 = time.perf_counter()
a, b, t = native.process_pair_batch(imgs, 256, threads=8)
print(f"native threaded: {(time.perf_counter()-t0)/64*1000:.2f} ms/img")
