"""Run this example (parity: reference examples/autoimplant2020/UNetSPDO/run.py)."""

import os

import ctunet_tpu

here = os.path.dirname(os.path.abspath(__file__))
params = ctunet_tpu.load_params(
    os.path.join(here, "FlapRecSP2O.ini"), ctunet_tpu.default_params()
)
ctunet_tpu.Model(params=params)
