-- Example 2 SQL (kept in its own file, fetched relative to the config,
-- like the reference's sql_file S3 fetch). {status} interpolates from the
-- pipeline variables -- including inside SQL text, as in the reference.
SELECT CAST(o_orderdate AS DATE) AS order_day,
       o_orderpriority,
       COUNT(*)          AS n_orders,
       SUM(o_totalprice) AS day_total
FROM sv_orders
WHERE o_orderstatus = '{status}'
GROUP BY order_day, o_orderpriority
