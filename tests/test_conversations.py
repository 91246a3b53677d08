import pyarrow as pa

from open_thoughts_ray.ops import conversations as C


def _sharegpt_batch():
    convs = [
        [{"from": "human", "value": "hi"}, {"from": "gpt", "value": "hello"}],
        [{"from": "system", "value": "be nice"},
         {"from": "human", "value": "q"}, {"from": "gpt", "value": "a"}],
    ]
    return pa.table({"id": pa.array([1, 2], pa.int64()),
                     "conversations": pa.array(convs, C.SHAREGPT_TYPE)})


def test_sharegpt_openai_roundtrip():
    b = _sharegpt_batch()
    out = C.openai_to_sharegpt(C.sharegpt_to_openai(b))
    assert out.column("conversations").to_pylist() == b.column("conversations").to_pylist()


def test_alpaca_to_sharegpt():
    b = pa.table({
        "instruction": pa.array(["add", "sub"], pa.string()),
        "input": pa.array(["1 2", ""], pa.string()),
        "output": pa.array(["3", "-1"], pa.string()),
    })
    out = C.alpaca_to_sharegpt(b)
    convs = out.column("conversations").to_pylist()
    assert convs[0][0] == {"from": "human", "value": "add\n1 2"}
    assert convs[1][0] == {"from": "human", "value": "sub"}
    assert convs[1][1] == {"from": "gpt", "value": "-1"}


def test_sharegpt_instruction_response_roundtrip():
    b = _sharegpt_batch()
    flat = C.sharegpt_to_instruction_response(b)
    assert flat.column("instruction").to_pylist() == ["hi", "q"]
    assert flat.column("response").to_pylist() == ["hello", "a"]
    back = C.instruction_response_to_sharegpt(
        flat.drop_columns(["conversations"]), system_prompt="be nice"
    )
    conv = back.column("conversations").to_pylist()[0]
    assert conv[0]["from"] == "system" and conv[1]["value"] == "hi"


def test_reasoning_trace_roundtrip():
    b = pa.table({"reasoning": pa.array(["step1\nstep2"], pa.string()),
                  "solution": pa.array(["42"], pa.string())})
    joined = C.reasoning_trace_to_final(b)
    back = C.final_to_reasoning_trace(joined.select(["final"]))
    assert back.column("reasoning").to_pylist() == ["step1\nstep2"]
    assert back.column("solution").to_pylist() == ["42"]


def test_converters_through_ray(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(_sharegpt_batch())
    out = ds.map_batches(C.sharegpt_to_openai, batch_format="pyarrow").take_all()
    assert out[0]["conversations"][0]["role"] == "user"
