"""Test-only handler that mutates a sample array IN PLACE — exercises the
zero-copy transport's writable-samples guarantee (Serialize.load_frames
writable=True in the workers): without the defensive copy, numpy raises
'assignment destination is read-only' inside the worker process."""

import numpy as np

from speechflow_tpu.data.processors import handler


@handler(inputs={"payload"}, outputs={"payload"})
def mutate_payload_inplace(ds):
    arr = ds.additional["payload"]
    arr += 1.0  # in-place: requires a writable array
    ds.additional["payload_sum"] = float(np.sum(arr))
    return ds
