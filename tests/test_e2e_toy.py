"""End-to-end smoke: toy recipe train → checkpoint → averaged decode → WER.

This is BASELINE.json configs[0]: the CPU-runnable 10-utt pipeline through
the real CLIs (bin/train.py, bin/decode.py) — config parsing, tokenizer
injection, on-device frontend, fit loop, orbax checkpointing, checkpoint
averaging, batched beam decode, WER report.
"""

import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOY = os.path.join(REPO, "example", "asr_toy")


@pytest.mark.slow
def test_toy_recipe_end_to_end(tmp_path):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

    workdir = tmp_path / "asr_toy"
    shutil.copytree(TOY, workdir)
    subprocess.run([sys.executable, "gen_data.py"], cwd=workdir, env=env,
                   check=True)

    exp = workdir / "exp"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "bin", "train.py"),
         "-config", "conf/config.yaml", "-exp_dir", str(exp),
         "-num_epochs", "8", "-num_devices", "2", "-ema", "1",
         "-log_interval", "5", "-num_workers", "2"],
        cwd=workdir, env=env, capture_output=True, text=True)
    assert r.returncode == 0, r.stderr[-4000:]
    assert (exp / "hparams.yaml").exists()
    assert (exp / "metrics.jsonl").exists()
    assert (exp / "checkpoints" / "last").exists()

    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "bin", "decode.py"),
         "-train_config", str(exp / "hparams.yaml"),
         "-decode_config", "conf/decode.yaml",
         "-model_path", str(exp / "checkpoints"),
         "-avg", "2", "-choose", "last",
         "-output_file", str(exp / "decode.txt")],
        cwd=workdir, env=env, capture_output=True, text=True)
    assert r.returncode == 0, r.stderr[-4000:]
    assert "Totol WER is" in r.stdout
    assert (exp / "decode.txt").exists()
    # 4 dev utterances decoded
    lines = (exp / "decode.txt").read_text().strip().split("\n")
    assert len(lines) == 4

    # every decode method dispatches from YAML alone (reference
    # decode_lighting.py:136-159): ctc_bs, ctc_greedy, and ctc_att with
    # nbest emission + RNNLM shallow fusion
    import yaml
    base_cfg = yaml.safe_load((workdir / "conf" / "decode.yaml").read_text())

    # a tiny RNNLM checkpoint for fusion (random weights — exercises the
    # lm_config/lm_path plumbing, not LM quality)
    import jax
    import jax.numpy as jnp
    import orbax.checkpoint as ocp
    sys.path.insert(0, REPO)
    from lasr_tpu.data.tokenizer import CharTokenizer
    from lasr_tpu.modules.rnn import RNNCellStack
    tok = CharTokenizer(str(workdir / "data" / "dict.txt"))
    lm_kwargs = dict(input_dim=tok.dict_size(), output_dim=tok.dict_size(),
                     n_layers=1, n_units=16, dropout_rate=0.0)
    lm_mod = RNNCellStack(**lm_kwargs)
    lm_vars = lm_mod.init(jax.random.PRNGKey(0), None,
                          jnp.zeros((1,), jnp.int32))
    lm_dir = exp / "lm_ckpt"
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(str(lm_dir), {"params": lm_vars["params"]})

    variants = {
        "ctc_bs": {"decode_method": "ctc_bs"},
        "ctc_greedy": {"decode_method": "ctc_greedy"},
        "ctc_att_nbest_lm": {
            "decode_method": "ctc_att", "nbest": 2, "lm_rate": 0.2,
            "lm_path": str(lm_dir),
            "lm_config": {"name": "lasr_tpu.modules.rnn:RNNCellStack",
                          "kwargs": lm_kwargs}},
    }
    for name, overrides in variants.items():
        cfg = dict(base_cfg)
        cfg["decode_config"] = {**base_cfg["decode_config"], **overrides}
        cfg_path = workdir / "conf" / f"decode_{name}.yaml"
        cfg_path.write_text(yaml.safe_dump(cfg))
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "bin", "decode.py"),
             "-train_config", str(exp / "hparams.yaml"),
             "-decode_config", str(cfg_path),
             "-model_path", str(exp / "checkpoints"),
             "-avg", "2", "-choose", "last",
             "-output_file", str(exp / f"decode_{name}.txt")],
            cwd=workdir, env=env, capture_output=True, text=True)
        assert r.returncode == 0, (name, r.stderr[-4000:])
        assert "Totol WER is" in r.stdout, name
        lines = (exp / f"decode_{name}.txt").read_text().strip().split("\n")
        assert len(lines) == 4, name
    # nbest file written with ranked scored hypotheses
    nb = (exp / "decode_ctc_att_nbest_lm.txt.nbest").read_text().strip()
    assert nb and all(line.split()[0].endswith(("-1", "-2"))
                      for line in nb.split("\n"))

    # ---- word-LM decoders from YAML alone (first-party KenLM/WFST
    # equivalents; the reference ships these commented out of its CLI,
    # decode_lighting.py:94-114) ----
    toy_words = ["GO", "STOP", "LEFT", "RIGHT"]
    char_ids = {c: tok.char_list.index(c)
                for c in sorted({ch for w in toy_words for ch in w})}
    space_id = tok.char_list.index(" ")
    (workdir / "lexicon.txt").write_text(
        "\n".join(f"{w} {' '.join(w)}" for w in toy_words) + "\n")
    (workdir / "tokens.txt").write_text(
        "\n".join([f"{c} {i}" for c, i in char_ids.items()]
                  + [f"<space> {space_id}"]) + "\n")
    (workdir / "lm.arpa").write_text(
        "\\data\\\nngram 1=7\n\n\\1-grams:\n"
        + "".join(f"-0.7\t{w}\n" for w in toy_words)
        + "-0.5\t<s>\t0.0\n-0.9\t</s>\n-2.0\t<unk>\n\n\\end\\\n")
    # hand-built CTC decoding graph: blank/space loops at the start
    # state, one char chain per word (self-loops for repeated frames)
    arcs, words_sym = [], ["<eps> 0"]
    arcs.append("0 0 1 0 0.0")                       # blank loop
    arcs.append(f"0 0 {space_id + 1} 0 0.0")         # space loop
    nstate = 1
    for wi, w in enumerate(toy_words, start=1):
        words_sym.append(f"{w} {wi}")
        src = 0
        for ci, ch in enumerate(w):
            il = char_ids[ch] + 1
            ol = wi if ci == 0 else 0
            arcs.append(f"{src} {nstate} {il} {ol} 0.0")
            arcs.append(f"{nstate} {nstate} {il} 0 0.0")   # frame repeats
            arcs.append(f"{nstate} {nstate} 1 0 0.0")      # blank
            src, nstate = nstate, nstate + 1
        arcs.append(f"{src} 0 0 0 0.0")              # word end (eps)
    (workdir / "graph.fst.txt").write_text("\n".join(arcs) + "\n0 0.0\n")
    (workdir / "words.txt").write_text("\n".join(words_sym) + "\n")

    wordlm_variants = {
        "ctc_kenlm": {
            "decode_method": "ctc_kenlm_lexcoin", "beam_threshold": 50.0,
            "lexicon": str(workdir / "lexicon.txt"),
            "tokens_dict": str(workdir / "tokens.txt"),
            "kenlm_model": str(workdir / "lm.arpa"),
            "lm_weight": 0.5, "word_score": -0.5,
            "sil": "<space>", "sil_score": 0.0},
        "wfst": {
            "decode_method": "wfst", "wfst_beam": 50.0, "max_active": 200,
            "fst": str(workdir / "graph.fst.txt"),
            "word": str(workdir / "words.txt"),
            "acoustic_scale": 1.0},
    }
    for name, overrides in wordlm_variants.items():
        cfg = dict(base_cfg)
        cfg["decode_config"] = {**base_cfg["decode_config"], **overrides}
        cfg_path = workdir / "conf" / f"decode_{name}.yaml"
        cfg_path.write_text(yaml.safe_dump(cfg))
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "bin", "decode.py"),
             "-train_config", str(exp / "hparams.yaml"),
             "-decode_config", str(cfg_path),
             "-model_path", str(exp / "checkpoints"),
             "-avg", "2", "-choose", "last",
             "-output_file", str(exp / f"decode_{name}.txt")],
            cwd=workdir, env=env, capture_output=True, text=True)
        assert r.returncode == 0, (name, r.stderr[-4000:])
        assert "Totol WER is" in r.stdout, name
        lines = (exp / f"decode_{name}.txt").read_text().strip().split("\n")
        assert len(lines) == 4, name
        # the lexicon/graph constrains every emitted word to the vocab
        for line in lines:
            hyp = line.rsplit("(", 1)[0].split()
            assert all(wd in toy_words for wd in hyp), (name, line)


@pytest.mark.slow
def test_toy_online_recipe_decodes(tmp_path):
    """ctc_att_online from YAML alone: train a tiny streaming model through
    bin/train.py, decode with decode_method: ctc_att_online."""
    import yaml
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"

    workdir = tmp_path / "asr_toy_online"
    shutil.copytree(TOY, workdir)
    subprocess.run([sys.executable, "gen_data.py"], cwd=workdir, env=env,
                   check=True)
    cfg = yaml.safe_load((workdir / "conf" / "config.yaml").read_text())
    mk = cfg["model_config"]["kwargs"]
    cfg["model_config"] = {
        "name": "lasr_tpu.models.e2e_online:E2E_Transformer_CTC_Online",
        "kwargs": {
            "idim": 80, "odim": 0,
            "encoder_attention_dim": 32, "encoder_attention_heads": 2,
            "encoder_left_chunk": 8, "encoder_center_chunk": 8,
            "encoder_right_chunk": 8,
            "encoder_linear_units": 64, "encoder_num_blocks": 1,
            "decoder_attention_dim": 32, "decoder_self_attention_heads": 2,
            "decoder_src_attention_heads": 2, "decoder_linear_units": 64,
            "decoder_num_block": 1, "encoder_dropout_rate": 0.0,
            "decoder_dropout_rate": 0.0, "ctc_dropout": 0.0,
            "decoder_src_attention_sigmoid_noise": 0.0,
        }}
    del mk
    (workdir / "conf" / "config.yaml").write_text(yaml.safe_dump(cfg))
    dcfg = yaml.safe_load((workdir / "conf" / "decode.yaml").read_text())
    dcfg["decode_config"]["decode_method"] = "ctc_att_online"
    (workdir / "conf" / "decode.yaml").write_text(yaml.safe_dump(dcfg))

    exp = workdir / "exp"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "bin", "train.py"),
         "-config", "conf/config.yaml", "-exp_dir", str(exp),
         "-num_epochs", "2", "-num_devices", "1",
         "-log_interval", "5", "-num_workers", "1"],
        cwd=workdir, env=env, capture_output=True, text=True)
    assert r.returncode == 0, r.stderr[-4000:]
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "bin", "decode.py"),
         "-train_config", str(exp / "hparams.yaml"),
         "-decode_config", "conf/decode.yaml",
         "-model_path", str(exp / "checkpoints"),
         "-avg", "1", "-choose", "last",
         "-output_file", str(exp / "decode_online.txt")],
        cwd=workdir, env=env, capture_output=True, text=True)
    assert r.returncode == 0, r.stderr[-4000:]
    assert "Totol WER is" in r.stdout
    lines = (exp / "decode_online.txt").read_text().strip().split("\n")
    assert len(lines) == 4


def test_toy_online_config_schema():
    """The shipped streaming recipe config (conf/config_online.yaml) must
    resolve through the registry to a buildable online model — pins the
    YAML schema the serving bench (tools/bench_streaming.py
    --train-config) consumes."""
    import yaml
    sys.path.insert(0, REPO)
    from lasr_tpu.utils.registry import BaseConfig
    from lasr_tpu.models.e2e_online import E2E_Transformer_CTC_Online

    cfg = yaml.safe_load(
        open(os.path.join(TOY, "conf", "config_online.yaml")))
    mc = dict(cfg["model_config"])
    mc["kwargs"] = dict(mc["kwargs"], odim=31)
    model = BaseConfig(**mc).generateExample()
    assert isinstance(model, E2E_Transformer_CTC_Online)
    assert model.encoder_center_chunk == 16
    # the other sections parse through the same registry contract
    for key in ("opti_config", "criterion_config", "tokenizer_config",
                "train_data_config", "valid_data_config"):
        assert "name" in cfg[key] and "kwargs" in cfg[key]
