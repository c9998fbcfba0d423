"""Run this example (parity: reference examples/autoimplant2020/UNet/run.py)."""

import os

import ctunet_tpu

here = os.path.dirname(os.path.abspath(__file__))
params = ctunet_tpu.load_params(
    os.path.join(here, "AutoImplant2020_woShapePrior.ini"), ctunet_tpu.default_params()
)
ctunet_tpu.Model(params=params)
