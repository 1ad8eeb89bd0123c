/* Offline app-shell service worker.
 *
 * Parity target: the reference PWA shell (reference:
 * web/frontend/public/sw.js + worker/model-cache.ts — cache-first static
 * shell; the model blob lives in IndexedDB there, server-side here).
 * Strategy:
 *   - shell assets ("/", "/sw.js", "/manifest.webmanifest"):
 *     stale-while-revalidate — instant offline load, background refresh.
 *   - /api/* and /ws: network only; /api falls back to a JSON
 *     {"offline": true} so the UI can render a deliberate offline state.
 */
"use strict";
const CACHE = "tilawa-shell-v1";
const SHELL = ["/", "/manifest.webmanifest"];

self.addEventListener("install", (ev) => {
  ev.waitUntil(
    caches.open(CACHE).then((c) => c.addAll(SHELL)).then(() => self.skipWaiting())
  );
});

self.addEventListener("activate", (ev) => {
  ev.waitUntil(
    caches
      .keys()
      .then((keys) =>
        Promise.all(keys.filter((k) => k !== CACHE).map((k) => caches.delete(k)))
      )
      .then(() => self.clients.claim())
  );
});

self.addEventListener("fetch", (ev) => {
  const url = new URL(ev.request.url);
  if (ev.request.method !== "GET" || url.origin !== location.origin) return;
  if (url.pathname.startsWith("/api/")) {
    ev.respondWith(
      fetch(ev.request).catch(
        () =>
          new Response(JSON.stringify({ offline: true }), {
            status: 503,
            headers: { "content-type": "application/json" },
          })
      )
    );
    return;
  }
  // Shell: serve cache immediately, refresh it in the background.
  ev.respondWith(
    caches.open(CACHE).then(async (c) => {
      const cached = await c.match(ev.request);
      const refresh = fetch(ev.request)
        .then((resp) => {
          if (resp.ok) c.put(ev.request, resp.clone());
          return resp;
        })
        .catch(() => cached);
      return cached || refresh;
    })
  );
});
