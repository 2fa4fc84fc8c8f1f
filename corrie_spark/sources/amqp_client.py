"""Broker client seam for the AMQP sharded-queue source.

`AmqpShardedQueueReader` and `ConfirmedProducer` talk to a broker
through a six-method contract (the exact surface the reference's
consumer/producer use — vendor nanachi consumer.go:248-268 consume/
ack loop, smart_producer.go:61-150 confirmed publish):

    publish(queue, body)                  fire-and-forget enqueue
    publish_confirmed(queue, body) -> ok  publisher-confirm enqueue
    consume(queue, max_n) -> [(tag, body, redelivered)]
    ack(queue, tag)
    nack(queue, tag, requeue=True)
    drop_connection(queue=None)           unacked window -> redelivery

Two implementations:

  - `FakeAmqpBroker` (amqp.py): file-backed, in-process — the sandbox
    default, also what the contract tests drive.
  - `PikaBroker` (here): the same contract mapped onto the pika
    `BlockingConnection` API against a live RabbitMQ. pika does not
    ship in this environment, so the import is deferred to first use;
    the mapping logic itself is unit-tested by injecting a pika-shaped
    connection factory (tests/test_amqp_contract.py), which proves the
    seam swappable without a live broker.

`connect_broker(options)` picks the implementation from reader/writer
options: `brokerUrl` (amqp://...) -> PikaBroker, else `broker`
(filesystem root) -> FakeAmqpBroker.
"""

from __future__ import annotations

from typing import Protocol, runtime_checkable


@runtime_checkable
class AmqpBroker(Protocol):
    def publish(self, queue: str, body: str) -> None: ...

    def publish_confirmed(self, queue: str, body: str) -> bool: ...

    def consume(self, queue: str, max_n: int) -> list[tuple[int, str, bool]]: ...

    def ack(self, queue: str, tag: int) -> None: ...

    def nack(self, queue: str, tag: int, requeue: bool = True) -> None: ...

    def drop_connection(self, queue: str | None = None) -> None: ...


class PikaBroker:
    """The broker contract over pika's BlockingConnection.

    Mapping (RabbitMQ semantics the fake reproduces):
      consume   -> channel.basic_get(auto_ack=False) loop; delivery tag
                   and `redelivered` come from the method frame. The
                   unacked window lives in the broker, exactly as the
                   reference relies on (consumer.go:81-116).
      ack/nack  -> basic_ack / basic_nack(requeue=...) on the SAME
                   channel that delivered the tag (AMQP scopes tags per
                   channel), hence one long-lived channel per queue.
      publish_confirmed -> confirm_delivery() once per channel, then
                   basic_publish(mandatory=True); pika raises
                   UnroutableError/NackError on broker nack -> False.
      drop_connection -> close and forget channels; the broker returns
                   every unacked delivery to the queue head marked
                   redelivered.

    Queues are declared durable and idempotently on first touch (the
    S3 idempotent-DDL behavior, reader.go:58-79's declare-on-connect).

    `connection_factory` is injectable: production passes nothing and
    gets `pika.BlockingConnection(pika.URLParameters(url))`; tests
    pass a factory returning a pika-shaped double.
    """

    def __init__(self, url: str, connection_factory=None):
        self.url = url
        if connection_factory is None:
            def connection_factory():  # deferred: pika absent in sandbox
                import pika

                return pika.BlockingConnection(pika.URLParameters(self.url))

        self._connect = connection_factory
        self._conn = None
        self._channels: dict[str, object] = {}
        self._confirming: set[str] = set()

    # --- channel management ------------------------------------------

    def _channel(self, queue: str):
        if self._conn is None or not getattr(self._conn, "is_open", True):
            self._conn = self._connect()
            self._channels.clear()
            self._confirming.clear()
        ch = self._channels.get(queue)
        if ch is None or not getattr(ch, "is_open", True):
            ch = self._conn.channel()
            ch.queue_declare(queue=queue, durable=True)  # idempotent DDL
            self._channels[queue] = ch
            self._confirming.discard(queue)
        return ch

    # --- contract ------------------------------------------------------

    def publish(self, queue: str, body: str) -> None:
        self._channel(queue).basic_publish(
            exchange="", routing_key=queue, body=body.encode()
        )

    def publish_confirmed(self, queue: str, body: str) -> bool:
        ch = self._channel(queue)
        if queue not in self._confirming:
            ch.confirm_delivery()
            self._confirming.add(queue)
        try:
            ch.basic_publish(
                exchange="", routing_key=queue, body=body.encode(), mandatory=True
            )
            return True
        except Exception:  # pika.exceptions.UnroutableError / NackError
            return False

    def consume(self, queue: str, max_n: int) -> list[tuple[int, str, bool]]:
        ch = self._channel(queue)
        out: list[tuple[int, str, bool]] = []
        while len(out) < max_n:
            method, _props, body = ch.basic_get(queue=queue, auto_ack=False)
            if method is None:
                break
            payload = body.decode() if isinstance(body, (bytes, bytearray)) else body
            out.append((method.delivery_tag, payload, bool(method.redelivered)))
        return out

    def ack(self, queue: str, tag: int) -> None:
        self._channel(queue).basic_ack(delivery_tag=tag)

    def nack(self, queue: str, tag: int, requeue: bool = True) -> None:
        self._channel(queue).basic_nack(delivery_tag=tag, requeue=requeue)

    def drop_connection(self, queue: str | None = None) -> None:
        # Scope matches FakeAmqpBroker: with a queue named, only that
        # queue's channel closes (AMQP scopes delivery tags per
        # channel, so the broker requeues exactly that channel's
        # unacked window); queue=None drops the whole connection and
        # every queue's window — multi-shard readers sharing one
        # client must not see sibling shards redelivered.
        if queue is not None:
            ch = self._channels.pop(queue, None)
            self._confirming.discard(queue)
            if ch is not None and getattr(ch, "is_open", True):
                ch.close()  # broker redelivers this channel's window
            return
        if self._conn is not None and getattr(self._conn, "is_open", True):
            self._conn.close()  # broker redelivers the unacked window
        self._conn = None
        self._channels.clear()
        self._confirming.clear()


def connect_broker(options: dict) -> AmqpBroker:
    """Select the broker implementation from source/sink options."""
    url = options.get("brokerUrl")
    if url:
        return PikaBroker(url)
    root = options.get("broker")
    if not root:
        raise ValueError("need option 'broker' (file root) or 'brokerUrl' (amqp://)")
    from corrie_spark.sources.amqp import FakeAmqpBroker

    return FakeAmqpBroker(root)
