/**
 * OpenTelemetry bridge — the TS face of the reference SDK's otel.ts
 * (`instrumentLanceDbMetrics`): adapt the RestClient's RequestObserver
 * hook onto an OpenTelemetry-style Meter without taking a hard
 * dependency on @opentelemetry/api (the structural types below match
 * its Meter/Counter/Histogram surface, so a real meter drops in).
 */

import { RequestObserver } from "./client.js";

/** Structural subset of @opentelemetry/api's Counter. */
export interface CounterLike {
  add(value: number, attributes?: Record<string, string | number>): void;
}

/** Structural subset of @opentelemetry/api's Histogram. */
export interface HistogramLike {
  record(value: number, attributes?: Record<string, string | number>): void;
}

/** Structural subset of @opentelemetry/api's Meter. */
export interface MeterLike {
  createCounter(name: string, options?: { description?: string; unit?: string }): CounterLike;
  createHistogram(name: string, options?: { description?: string; unit?: string }): HistogramLike;
}

/** The op label is the endpoint tail (e.g. "query", "merge_insert") —
 * low-cardinality, never the table name. */
function opOf(path: string): string {
  const parts = path.split("?")[0].split("/").filter(Boolean);
  // /v1/table/{name}/{op...}  |  /v1/sql  |  /v1/jobs[...]
  if (parts[1] === "table" && parts.length >= 4) return parts.slice(3).join("/");
  return parts.slice(1).join("/");
}

/**
 * Build a RequestObserver recording request count, error count, and
 * latency histogram on `meter`. Pass the result as
 * `ClientConfig.observer`.
 */
export function instrumentLanceDbMetrics(meter: MeterLike): RequestObserver {
  const requests = meter.createCounter("lancedb.client.requests", {
    description: "requests issued by the lancedb-tpu TS client",
  });
  const errors = meter.createCounter("lancedb.client.errors", {
    description: "failed request attempts (HTTP >= 400 or transport error)",
  });
  const latency = meter.createHistogram("lancedb.client.request_duration", {
    description: "per-attempt request latency",
    unit: "ms",
  });
  return {
    onRequest(info) {
      const attrs = {
        op: opOf(info.path),
        method: info.method,
        status: String(info.status),
      };
      requests.add(1, attrs);
      if (info.status === "error" || (typeof info.status === "number" && info.status >= 400)) {
        errors.add(1, attrs);
      }
      latency.record(info.durationMs, attrs);
    },
  };
}

/** In-memory meter for tests and quick introspection (mirrors the
 * python metrics.py recorder: counters + histogram samples). */
export class InMemoryMeter implements MeterLike {
  readonly counters = new Map<string, Array<{ value: number; attributes?: object }>>();
  readonly histograms = new Map<string, Array<{ value: number; attributes?: object }>>();

  createCounter(name: string): CounterLike {
    const sink: Array<{ value: number; attributes?: object }> = [];
    this.counters.set(name, sink);
    return { add: (value, attributes) => sink.push({ value, attributes }) };
  }

  createHistogram(name: string): HistogramLike {
    const sink: Array<{ value: number; attributes?: object }> = [];
    this.histograms.set(name, sink);
    return { record: (value, attributes) => sink.push({ value, attributes }) };
  }

  total(counter: string): number {
    return (this.counters.get(counter) ?? []).reduce((s, o) => s + o.value, 0);
  }
}
