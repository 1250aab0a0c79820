

def test_mixture_weights_hand_computed(spark):
    """Uniform-target weights on a 2-source corpus: the small source
    gets upsampled (capped), the big one downsampled; shares exact."""
    from patientdataintegration_spark.operators.mixture import mixture_weights

    df = spark.createDataFrame(
        [("a b c d e f", "web")] * 3 + [("x y", "code")],
        "text string, source string",
    )
    rows = {r.source: r for r in mixture_weights(df, max_epochs=4.0).collect()}
    web, code = rows["web"], rows["code"]
    assert (web.n_docs, web.n_tokens) == (3, 18) and (code.n_docs, code.n_tokens) == (1, 2)
    assert web.natural_share == 18 / 20 and code.natural_share == 2 / 20
    # target per source = 10 tokens: web 10/18, code capped at 4.0 (not 5.0)
    assert web.weight == (20.0 / 2) / 18 and code.weight == 4.0
    assert code.target_tokens == 8.0
