"""CLI (SURVEY.md §2.1 A7): ``fluvii-spark topics {list,create,alter,delete,
sync,consume,produce}`` mirroring the reference's click group
(``fluvii/cli/commands/topics.py:1-111``), plus engine commands the
reference has no analogue for (``queries``, ``bench``).

Topic commands take ``--topic-config`` / stdin JSON exactly like the
reference (stdin piping: ``topics.py:100-111``).
"""

from __future__ import annotations

import json
import sys

import click


@click.group()
def cli() -> None:
    """fluvii-spark: PySpark-native stream/batch analytics engine."""


@cli.group()
@click.option("--bootstrap-servers", default="localhost:9092", envvar="FLUVII_SPARK_CONSUMER_BOOTSTRAP_SERVERS")
@click.pass_context
def topics(ctx: click.Context, bootstrap_servers: str) -> None:
    """Topic administration (A1-A7)."""
    ctx.ensure_object(dict)
    ctx.obj["bootstrap_servers"] = bootstrap_servers


def _toolbox(ctx: click.Context):
    from fluvii_spark.toolbox import Toolbox, confluent_admin

    try:
        return Toolbox(confluent_admin(ctx.obj["bootstrap_servers"]))
    except RuntimeError as e:
        raise click.ClickException(str(e)) from e


def _read_config(config_json: str | None) -> dict:
    if config_json is None or config_json == "-":
        return json.load(sys.stdin)
    return json.loads(config_json)


@topics.command("list")
@click.option("--include-invalid", is_flag=True)
@click.pass_context
def list_cmd(ctx: click.Context, include_invalid: bool) -> None:
    out = _toolbox(ctx).list_topics(valid_only=not include_invalid)
    click.echo(json.dumps(out, indent=2, sort_keys=True))


@topics.command("create")
@click.option("--topic-config", default="-", help="JSON dict or - for stdin")
@click.pass_context
def create_cmd(ctx: click.Context, topic_config: str) -> None:
    created = _toolbox(ctx).create_topics(_read_config(topic_config))
    click.echo(json.dumps({"created": created}))


@topics.command("alter")
@click.option("--topic-config", default="-")
@click.pass_context
def alter_cmd(ctx: click.Context, topic_config: str) -> None:
    altered = _toolbox(ctx).alter_topics(_read_config(topic_config))
    click.echo(json.dumps({"altered": altered}))


@topics.command("delete")
@click.argument("names", nargs=-1, required=True)
@click.pass_context
def delete_cmd(ctx: click.Context, names: tuple[str, ...]) -> None:
    deleted = _toolbox(ctx).delete_topics(list(names))
    click.echo(json.dumps({"deleted": deleted}))


@topics.command("sync")
@click.option("--topic-config", default="-")
@click.pass_context
def sync_cmd(ctx: click.Context, topic_config: str) -> None:
    result = _toolbox(ctx).sync_topics(_read_config(topic_config))
    click.echo(json.dumps(result))


@topics.command("consume")
@click.option("--topics-json", default="-", help='{"topic": {"0": 100}} or - for stdin')
@click.option("--output", required=True, help="output directory for JSON dump")
@click.pass_context
def consume_cmd(ctx: click.Context, topics_json: str, output: str) -> None:
    """S4: dump whole topics to JSON files."""
    from fluvii_spark.io.kafka import dump_topics_to_json
    from fluvii_spark.session import get_session

    dump_topics_to_json(
        get_session("fluvii-spark-cli"),
        ctx.obj["bootstrap_servers"],
        _read_config(topics_json),
        output,
    )
    click.echo(json.dumps({"dumped_to": output}))


@topics.command("produce")
@click.option(
    "--input",
    "input_path",
    default="-",
    help="JSON dump path, or - to pipe messages via stdin "
    "(reference parity: fluvii/cli/commands/topics.py:100-111)",
)
@click.option("--topic-override", default=None)
@click.option(
    "--use-given-partitions",
    is_flag=True,
    help="honor each message's explicit partition (reference flag)",
)
@click.option(
    "--binary-base64",
    is_flag=True,
    help="key/value are base64 (dumps written by `topics consume`)",
)
@click.pass_context
def produce_cmd(
    ctx: click.Context,
    input_path: str,
    topic_override: str | None,
    use_given_partitions: bool,
    binary_base64: bool,
) -> None:
    """A6: bulk produce a JSON dump back to Kafka."""
    import tempfile

    from fluvii_spark.io.kafka import produce_from_json
    from fluvii_spark.session import get_session

    staged: str | None = None
    if input_path == "-":
        # stdin carries a JSON array of message dicts (the reference's
        # piped form); spark.read.json wants files, so stage to a temp
        # file as JSON Lines (removed after the produce completes)
        messages = json.load(sys.stdin)
        if not isinstance(messages, list):
            messages = [messages]
        tmp = tempfile.NamedTemporaryFile(
            "w", suffix=".json", delete=False
        )
        with tmp:
            for m in messages:
                tmp.write(json.dumps(m) + "\n")
        input_path = staged = tmp.name
    try:
        produce_from_json(
            get_session("fluvii-spark-cli"),
            ctx.obj["bootstrap_servers"],
            input_path,
            topic_override=topic_override,
            use_given_partitions=use_given_partitions,
            binary_base64=binary_base64,
        )
    finally:
        if staged is not None:
            import os

            os.unlink(staged)
    click.echo(json.dumps({"produced_from": input_path}))


@cli.command("queries")
def queries_cmd() -> None:
    """List the declared query inventory (SURVEY.md §2.3)."""
    from fluvii_spark.queries import registry

    for name, q in sorted(registry().items()):
        click.echo(f"{name}\t{'sql-oracle' if q.oracle else 'rows-only'}\t{q.description[:80]}")


@cli.command("run-query")
@click.argument("name")
@click.option("--sf-dir", default="/root/testdata/sf0.001", envvar="SPARK_GRAFT_SF_DIR")
@click.option("--limit", default=20, type=int)
def run_query_cmd(name: str, sf_dir: str, limit: int) -> None:
    """Run one inventory query and print rows."""
    from fluvii_spark.queries import registry
    from fluvii_spark.session import get_session

    reg = registry()
    if name not in reg:
        raise click.ClickException(
            f"unknown query {name!r}; run `fluvii-spark queries` to list"
        )
    spark = get_session("fluvii-spark-cli")
    spark.sparkContext.setLogLevel("ERROR")
    reg[name].fn(spark, sf_dir).show(limit, truncate=False)


@cli.command("plan")
@click.argument("name")
@click.option("--sf-dir", default="/root/testdata/sf0.001", envvar="SPARK_GRAFT_SF_DIR")
@click.option(
    "--mode",
    default="formatted",
    type=click.Choice(["formatted", "extended", "cost", "codegen"]),
)
def plan_cmd(name: str, sf_dir: str, mode: str) -> None:
    """Print one inventory query's physical plan + a shape summary.

    The summary counts shuffle Exchanges, join strategies, parquet filter
    pushdown and whole-stage codegen — the SAME audit `tools/plan_audit.py`
    writes to PLANS.md (shared `fluvii_spark.planshape`). Only `formatted`
    plans number operators, so the summary is printed for that mode only.
    """
    from fluvii_spark.planshape import audit, explain_str
    from fluvii_spark.queries import registry
    from fluvii_spark.session import get_session

    reg = registry()
    if name not in reg:
        raise click.ClickException(
            f"unknown query {name!r}; run `fluvii-spark queries` to list"
        )
    spark = get_session("fluvii-spark-cli")
    spark.sparkContext.setLogLevel("ERROR")
    plan = explain_str(reg[name].fn(spark, sf_dir), mode)
    click.echo(plan)
    if mode == "formatted":
        a = audit(plan)
        click.echo(
            "-- shape: exchanges=%d reused=%d joins=[%s] pushdown=%s"
            " codegen=%s"
            % (
                a["exchanges"],
                a["reused"],
                a["joins"] or "none",
                a["pushdown"] or "no",
                a["codegen"] or "no",
            )
        )


@cli.command("bench")
def bench_cmd() -> None:
    """Run the benchmark harness (same as `python bench.py`)."""
    try:
        import bench
    except ImportError:
        # bench.py lives at the repo root, not inside the installed package
        # — a console-script's sys.path has neither the cwd nor the repo.
        # Resolve it next to the package checkout before giving up.
        import importlib.util
        import os

        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        path = os.path.join(root, "bench.py")
        if not os.path.exists(path):
            raise click.ClickException(
                "bench.py not found: run from a source checkout "
                f"(looked in {root})"
            )
        spec = importlib.util.spec_from_file_location("bench", path)
        bench = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(bench)

    bench.main()


if __name__ == "__main__":
    cli()
