"""Engine-level tests: generate loop, chunked decode consistency, stop
tokens, host-sampling parity RNG, CLI."""
import math

import numpy as np
import pytest

from fastllama_tpu.config import EngineConfig, QuantType
from fastllama_tpu.loaders.registry import FileType
from fastllama_tpu.runtime.engine import Engine
from fastllama_tpu.runtime.sampler import HostSampler, XorshiftRng
from fastllama_tpu.tools.synthetic import TINY, write_tiny_llama2c


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    d = tmp_path_factory.mktemp("engine_ckpt")
    ckpt, tokp = write_tiny_llama2c(str(d))
    return Engine.load(ckpt, tokp, FileType.LLAMA2C, QuantType.INT8,
                       EngineConfig(max_seq_len=64))


def test_generate_greedy(engine):
    toks, st = engine.generate("the cat", max_new_tokens=12, temperature=0.0)
    assert 0 < len(toks) <= 12
    assert st.prompt_tokens >= 2
    assert st.output_tokens == len(toks)


def test_chunked_equals_stepwise(engine):
    """decode_chunk=1 and decode_chunk=8 must produce identical greedy text."""
    t1, _ = engine.generate("the dog", max_new_tokens=10, temperature=0.0,
                            decode_chunk=1, stop_tokens=())
    t8, _ = engine.generate("the dog", max_new_tokens=10, temperature=0.0,
                            decode_chunk=8, stop_tokens=())
    assert t1 == t8


def test_host_sampling_greedy_matches_device(engine):
    td, _ = engine.generate("the boy", max_new_tokens=8, temperature=0.0,
                            stop_tokens=())
    th, _ = engine.generate("the boy", max_new_tokens=8, temperature=0.0,
                            host_sampling=True, stop_tokens=())
    assert td == th


def test_stop_token(engine):
    toks, _ = engine.generate("the cat", max_new_tokens=20, temperature=0.0,
                              stop_tokens=())
    assert len(toks) == 20
    stop = toks[4]
    toks2, _ = engine.generate("the cat", max_new_tokens=20, temperature=0.0,
                               stop_tokens=(stop,))
    assert toks2 == toks[:toks.index(stop) + 1]


def test_callback_stream_and_cancel(engine):
    seen = []

    def cb(text, tok):
        seen.append(tok)
        return len(seen) < 3

    toks, _ = engine.generate("the cat", max_new_tokens=20, temperature=0.0,
                              callback=cb, stop_tokens=())
    assert len(toks) == 3 and seen == toks


def test_prompt_too_long(engine):
    with pytest.raises(ValueError):
        engine.generate(list(range(1, 70)), max_new_tokens=4)


def test_temperature_sampling_runs(engine):
    toks, _ = engine.generate("the cat", max_new_tokens=8, temperature=0.8,
                              topp=0.9, seed=7, stop_tokens=())
    assert len(toks) == 8


def test_xorshift_matches_cpp_constants():
    # first values of xorshift64* from a known seed, computed independently
    rng = XorshiftRng(128391297)
    vals = [rng.random_u32() for _ in range(3)]
    # recompute by hand (same algorithm, fresh instance)
    s = 128391297
    M = (1 << 64) - 1
    out = []
    for _ in range(3):
        s ^= s >> 12
        s = (s ^ (s << 25)) & M
        s ^= s >> 27
        out.append(((s * 0x2545F4914F6CDD1D) & M) >> 32)
    assert vals == out
    f = XorshiftRng(1).random_f32()
    assert 0.0 <= f < 1.0


def test_host_topp_sampler():
    hs = HostSampler(10, seed=42)
    probs_logits = np.array([0.0] * 10, np.float32)
    probs_logits[3] = 10.0  # dominant
    for _ in range(5):
        assert hs.sample(probs_logits, temperature=0.7, topp=0.5) == 3


def test_cli_encode_decode(tmp_path, capsys):
    from fastllama_tpu.cli import main
    ckpt, tokp = write_tiny_llama2c(str(tmp_path))
    rc = main(["-c", ckpt, "-z", tokp, "-f", "llama2c", "-e", "the cat"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "tokens(" in out


def test_cli_generate(tmp_path, capsys):
    from fastllama_tpu.cli import main
    ckpt, tokp = write_tiny_llama2c(str(tmp_path))
    rc = main(["-c", ckpt, "-z", tokp, "-f", "llama2c", "-i", "the cat",
               "-n", "6", "-t", "0", "--max-seq-len", "64",
               "--mode", "benchmark", "--rounds", "1"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "output_speed" in out


def test_chat_session_matches_fresh_generate(engine):
    """A session turn must produce the same greedy continuation as a fresh
    generate over the same token history (cache/pos bookkeeping check)."""
    from fastllama_tpu.runtime.engine import ChatSession
    sess = ChatSession(engine)
    reply = sess.generate("the cat", max_new_tokens=8, temperature=0.0)

    hist = [engine.tokenizer.bos_token_id] + \
        engine.tokenizer.encode("the cat", add_bos=False)
    ref_toks, _ = engine.generate(hist, max_new_tokens=8, temperature=0.0,
                                  stop_tokens=(0, engine.tokenizer.eos_token_id))
    assert reply == engine.tokenizer.decode(ref_toks)


def test_chat_session_multi_turn(engine):
    from fastllama_tpu.runtime.engine import ChatSession
    sess = ChatSession(engine)
    r1 = sess.generate("the cat", max_new_tokens=4, temperature=0.0)
    pos_after_1 = sess.pos
    r2 = sess.generate("the dog", max_new_tokens=4, temperature=0.0)
    assert sess.pos > pos_after_1
    assert isinstance(r1, str) and isinstance(r2, str)


def test_cli_serve_mode(tmp_path, capsys):
    from fastllama_tpu import cli
    from fastllama_tpu.tools.synthetic import write_tiny_llama2c

    ckpt, tokp = write_tiny_llama2c(str(tmp_path))
    pf = tmp_path / "prompts.txt"
    pf.write_text("the cat\nthe dog\nhello\n")
    rc = cli.main(["-c", ckpt, "-z", tokp, "-f", "llama2c",
                   "--mode", "serve", "--batch", "2",
                   "--prompts-file", str(pf), "-n", "6", "-t", "0",
                   "--max-seq-len", "64"])
    assert rc == 0
    out = capsys.readouterr().out
    assert out.count("ttft=") == 3


def test_eval_ppl_tool(tmp_path):
    """Perplexity gate: int8 ppl must track fp32 closely on the tiny model
    (SURVEY §7 step 8), and the quantized run must not be degenerate."""
    from fastllama_tpu.config import EngineConfig
    from fastllama_tpu.tools.eval_ppl import evaluate
    from fastllama_tpu.tools.synthetic import write_tiny_llama2c

    ckpt, tokp = write_tiny_llama2c(str(tmp_path))
    ids = list(range(2, 120))
    e8 = Engine.load(ckpt, tokp, FileType.LLAMA2C, QuantType.INT8,
                     EngineConfig(max_seq_len=64, compute_dtype="float32"))
    ef = Engine.load(ckpt, tokp, FileType.LLAMA2C, QuantType.NONE,
                     EngineConfig(max_seq_len=64, compute_dtype="float32"))
    p8 = evaluate(e8, ids, window=32)
    pf = evaluate(ef, ids, window=32)
    assert 1.0 < pf < 1e7 and 1.0 < p8 < 1e7
    assert abs(math.log(p8) - math.log(pf)) < 0.5 * abs(math.log(pf)) + 0.5


def test_cli_benchmark_mode(tmp_path, capsys):
    from fastllama_tpu import cli
    from fastllama_tpu.tools.synthetic import write_tiny_llama2c

    ckpt, tokp = write_tiny_llama2c(str(tmp_path))
    rc = cli.main(["-c", ckpt, "-z", tokp, "-f", "llama2c",
                   "--mode", "benchmark", "--rounds", "2", "-n", "6",
                   "-t", "0", "-i", "the cat", "--max-seq-len", "64"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "output_speed" in out and "prompt_token_latency" in out


def test_cli_serve_with_mesh(tmp_path, capsys):
    import jax

    if len(jax.devices()) < 2:
        import pytest
        pytest.skip("needs >= 2 virtual devices")
    from fastllama_tpu import cli
    from fastllama_tpu.tools.synthetic import write_tiny_llama2c

    ckpt, tokp = write_tiny_llama2c(str(tmp_path))
    pf = tmp_path / "p.txt"
    pf.write_text("the cat\nthe dog\n")
    rc = cli.main(["-c", ckpt, "-z", tokp, "-f", "llama2c",
                   "--mode", "serve", "--batch", "2", "--mesh",
                   "data=1,model=2", "--prompts-file", str(pf),
                   "-n", "4", "-t", "0", "--max-seq-len", "64"])
    assert rc == 0
    assert capsys.readouterr().out.count("ttft=") == 2


def test_eval_ppl_decode_path_matches_prefill(tmp_path):
    """evaluate_decode scores through the BatchedEngine's own decode step;
    on fp32 KV the teacher-forced decode math must agree with the prefill
    evaluate() (same model, same windows), and the int8-KV serving config
    must stay close — the accuracy gate for the path that actually serves."""
    import math as _math
    from fastllama_tpu.config import EngineConfig
    from fastllama_tpu.runtime.batching import BatchedEngine
    from fastllama_tpu.tools.eval_ppl import evaluate, evaluate_decode
    from fastllama_tpu.tools.synthetic import write_tiny_llama2c

    ckpt, tokp = write_tiny_llama2c(str(tmp_path))
    ids = list(range(2, 120))

    ef = Engine.load(ckpt, tokp, FileType.LLAMA2C, QuantType.INT8,
                     EngineConfig(max_seq_len=64, compute_dtype="float32"))
    p_prefill = evaluate(ef, ids, window=32)

    be = BatchedEngine.load(ckpt, tokp, FileType.LLAMA2C, QuantType.INT8,
                            EngineConfig(max_seq_len=64, max_batch_size=2,
                                         compute_dtype="float32"))
    p_decode = evaluate_decode(be, ids, window=32, step_chunk=16)
    assert abs(_math.log(p_decode) - _math.log(p_prefill)) < 1e-3

    be8 = BatchedEngine.load(ckpt, tokp, FileType.LLAMA2C, QuantType.INT8,
                             EngineConfig(max_seq_len=64, max_batch_size=2,
                                          compute_dtype="float32",
                                          kv_dtype="int8"))
    p_kv8 = evaluate_decode(be8, ids, window=32, step_chunk=16)
    assert 1.0 < p_kv8 < 1e7
    assert abs(_math.log(p_kv8) - _math.log(p_prefill)) < 0.1 * abs(
        _math.log(p_prefill)) + 0.1


def test_chunked_prefill_matches_whole_prompt(tmp_path):
    from fastllama_tpu.config import ModelConfig
    """prefill_chunk: a long prompt prefills as fixed-size mid-sequence
    blocks — same outputs as the whole-prompt path, and only chunk-sized
    programs are ever compiled (bounded compile/memory for long contexts)."""
    from fastllama_tpu.config import EngineConfig
    from fastllama_tpu.tools.synthetic import write_tiny_llama2c

    cfg = ModelConfig(dim=64, hidden_dim=128, n_layers=2, n_heads=4,
                      n_kv_heads=4, vocab_size=512, max_seq_len=256,
                      group_size=16)
    ckpt, tokp = write_tiny_llama2c(str(tmp_path), cfg=cfg)
    prompt = [(i * 7) % 500 + 1 for i in range(150)]

    base = Engine.load(ckpt, tokp, FileType.LLAMA2C, QuantType.INT8,
                       EngineConfig(max_seq_len=256,
                                    compute_dtype="float32"))
    want, _ = base.generate(prompt, max_new_tokens=8, temperature=0.0,
                            stop_tokens=(), decode_chunk=4)

    eng = Engine.load(ckpt, tokp, FileType.LLAMA2C, QuantType.INT8,
                      EngineConfig(max_seq_len=256, compute_dtype="float32",
                                   prefill_chunk=64))
    got, st = eng.generate(prompt, max_new_tokens=8, temperature=0.0,
                           stop_tokens=(), decode_chunk=4)
    assert got == want
    # only 64-row prefill programs were compiled (one fresh, one mid-seq)
    assert set(eng._prefill_fns) == {(64, True), (64, False)}
    assert st.prompt_tokens == 150


def test_cli_spec_and_prefix_flags(tmp_path, capsys):
    """--spec (n-gram speculative) and --prefix-cache CLI paths run end to
    end on the tiny model."""
    from fastllama_tpu import cli
    from fastllama_tpu.tools.synthetic import write_tiny_llama2c

    ckpt, tokp = write_tiny_llama2c(str(tmp_path))
    rc = cli.main(["-c", ckpt, "-z", tokp, "-f", "llama2c", "-t", "0",
                   "-n", "8", "-i", "the cat", "--max-seq-len", "64",
                   "--spec", "--spec-width", "4", "--detail"])
    assert rc == 0
    out = capsys.readouterr()
    assert "output:" in out.out

    pf = tmp_path / "prompts.txt"
    pf.write_text("the cat sat\nthe cat ran\n")
    rc = cli.main(["-c", ckpt, "-z", tokp, "-f", "llama2c", "-t", "0",
                   "-n", "6", "--mode", "serve", "--batch", "2",
                   "--max-seq-len", "64", "--prefix-cache",
                   "--prompts-file", str(pf)])
    assert rc == 0
    assert "served 2 requests" in capsys.readouterr().err


def test_chat_session_chunked_feed(tmp_path):
    """ChatSession.feed with prefill_chunk: a long turn prefills in blocks
    and continues the conversation identically to the unchunked session."""
    from fastllama_tpu.config import EngineConfig, ModelConfig
    from fastllama_tpu.runtime.engine import ChatSession
    from fastllama_tpu.tools.synthetic import write_tiny_llama2c

    cfg = ModelConfig(dim=64, hidden_dim=128, n_layers=2, n_heads=4,
                      n_kv_heads=4, vocab_size=512, max_seq_len=256,
                      group_size=16)
    ckpt, tokp = write_tiny_llama2c(str(tmp_path), cfg=cfg)
    turn = [(i * 7) % 500 + 1 for i in range(100)]

    def run(chunk):
        eng = Engine.load(ckpt, tokp, FileType.LLAMA2C, QuantType.INT8,
                          EngineConfig(max_seq_len=256,
                                       compute_dtype="float32",
                                       prefill_chunk=chunk))
        s = ChatSession(eng)
        s.feed(turn)
        import jax.numpy as jnp
        import numpy as np
        return s.pos, np.asarray(s._last_logits)

    pos_a, lg_a = run(0)
    pos_b, lg_b = run(32)
    assert pos_a == pos_b == 101
    import numpy as np
    np.testing.assert_allclose(lg_a, lg_b, rtol=2e-4, atol=2e-4)


def test_cli_serve_spec_batched(tmp_path, capsys):
    """--mode serve --spec routes through SpecBatchedEngine end to end."""
    from fastllama_tpu import cli
    from fastllama_tpu.tools.synthetic import write_tiny_llama2c

    ckpt, tokp = write_tiny_llama2c(str(tmp_path))
    pf = tmp_path / "prompts.txt"
    pf.write_text("the cat sat\nthe cat ran\n")
    rc = cli.main(["-c", ckpt, "-z", tokp, "-f", "llama2c", "-t", "0",
                   "-n", "8", "--mode", "serve", "--batch", "2",
                   "--max-seq-len", "64", "--spec", "--spec-width", "3",
                   "--prompts-file", str(pf)])
    assert rc == 0
    assert "served 2 requests" in capsys.readouterr().err
